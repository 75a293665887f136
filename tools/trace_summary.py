"""Summarize a jax.profiler trace (xplane.pb) without TensorBoard.

``jax.profiler.trace`` / ``--profile-dir`` write
``<dir>/plugins/profile/<run>/<host>.xplane.pb``. The usual viewer is the
TensorBoard profile plugin, which is unusable headless here (its pywrap
converter is version-mismatched in this container). This tool decodes the
XSpace protobuf with a minimal hand-rolled wire-format reader (schema:
tsl/profiler/protobuf/xplane.proto — stable field numbers) and prints,
per device plane, total device time and the top ops by self time with
their HLO category — enough to answer "where did the step time go"
(e.g. the round-1 finding that ~30% of the flagship step was
space-to-batch layout copies, BASELINE.md).

Usage::

    python tools/trace_summary.py <trace_dir> [--top 25] [--plane TPU]

Prints one JSON line per plane: {"plane", "total_ms", "ops": [...]}.
"""

import argparse
import glob
import json
import os
import struct
import sys
from collections import defaultdict


# ---------------------------------------------------------------------------
# minimal protobuf wire-format reader
# ---------------------------------------------------------------------------

def _read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def fields(buf):
    """Yield (field_number, wire_type, value) over a message buffer.
    value: int for varint/fixed, memoryview for length-delimited."""
    pos, end = 0, len(buf)
    while pos < end:
        tag, pos = _read_varint(buf, pos)
        fnum, wtype = tag >> 3, tag & 7
        if wtype == 0:        # varint
            val, pos = _read_varint(buf, pos)
        elif wtype == 1:      # 64-bit
            val = struct.unpack_from('<Q', buf, pos)[0]
            pos += 8
        elif wtype == 2:      # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wtype == 5:      # 32-bit
            val = struct.unpack_from('<I', buf, pos)[0]
            pos += 4
        else:
            raise ValueError('unsupported wire type {0}'.format(wtype))
        yield fnum, wtype, val


# ---------------------------------------------------------------------------
# xplane.proto walkers (field numbers per tsl/profiler/protobuf/xplane.proto)
# ---------------------------------------------------------------------------

def parse_event_metadata(buf):
    """XEventMetadata: id=1, name=2, display_name=3, stats=5 (per-op
    static info — hlo_category/flops/bytes live HERE on TPU device
    planes, not on the per-occurrence XEvents)."""
    mid, name, display, stats = 0, '', '', []
    for fnum, wtype, val in fields(buf):
        if fnum == 1 and wtype == 0:
            mid = val
        elif fnum == 2 and wtype == 2:
            name = bytes(val).decode('utf-8', 'replace')
        elif fnum == 3 and wtype == 2:
            display = bytes(val).decode('utf-8', 'replace')
        elif fnum == 5 and wtype == 2:
            stats.append(parse_stat(val))
    return mid, (display or name), stats


def parse_stat_metadata(buf):
    """XStatMetadata: id=1, name=2."""
    mid, name = 0, ''
    for fnum, wtype, val in fields(buf):
        if fnum == 1 and wtype == 0:
            mid = val
        elif fnum == 2 and wtype == 2:
            name = bytes(val).decode('utf-8', 'replace')
    return mid, name


def parse_stat(buf):
    """XStat: metadata_id=1, double=2, uint64=3, int64=4, str=5, bytes=6,
    ref=7 (ref indexes stat_metadata names)."""
    mid, value = 0, None
    for fnum, wtype, val in fields(buf):
        if fnum == 1 and wtype == 0:
            mid = val
        elif fnum == 2:
            value = struct.unpack('<d', struct.pack('<Q', val))[0]
        elif fnum in (3, 7):
            value = ('ref', val) if fnum == 7 else val
        elif fnum == 4 and wtype == 0:
            value = val  # int64: plain varint in proto3
        elif fnum in (5, 6) and wtype == 2:
            value = bytes(val).decode('utf-8', 'replace')
    return mid, value


def parse_event(buf):
    """XEvent: metadata_id=1, offset_ps=2, duration_ps=3, stats=4."""
    mid, dur, stats = 0, 0, []
    for fnum, wtype, val in fields(buf):
        if fnum == 1 and wtype == 0:
            mid = val
        elif fnum == 3 and wtype == 0:
            dur = val
        elif fnum == 4 and wtype == 2:
            stats.append(parse_stat(val))
    return mid, dur, stats


def parse_line(buf):
    """XLine: id=1, name=2, timestamp_ns=3, events=4 (observed from
    current jaxlib output; display_name=11)."""
    name, events = '', []
    for fnum, wtype, val in fields(buf):
        if fnum == 2 and wtype == 2:
            name = bytes(val).decode('utf-8', 'replace')
        elif fnum == 4 and wtype == 2:
            try:
                ev = parse_event(val)
            except Exception:
                continue
            if ev[0]:
                events.append(ev)
    return name, events


def parse_plane(buf):
    """XPlane: name=2, lines=3, event_metadata=4 (map), stat_metadata=5."""
    name, lines, emeta, smeta = '', [], {}, {}
    for fnum, wtype, val in fields(buf):
        if fnum == 2 and wtype == 2:
            name = bytes(val).decode('utf-8', 'replace')
        elif fnum == 3 and wtype == 2:
            lines.append(parse_line(val))
        elif fnum == 4 and wtype == 2:
            # map<int64, XEventMetadata> entry: key=1, value=2
            for f2, w2, v2 in fields(val):
                if f2 == 2 and w2 == 2:
                    mid, nm, mstats = parse_event_metadata(v2)
                    emeta[mid] = (nm, mstats)
        elif fnum == 5 and wtype == 2:
            for f2, w2, v2 in fields(val):
                if f2 == 2 and w2 == 2:
                    mid, nm = parse_stat_metadata(v2)
                    smeta[mid] = nm
    return name, lines, emeta, smeta


def parse_xspace(path):
    with open(path, 'rb') as f:
        buf = memoryview(f.read())
    planes = []
    for fnum, wtype, val in fields(buf):
        if fnum == 1 and wtype == 2:
            planes.append(parse_plane(val))
    return planes


# ---------------------------------------------------------------------------
# summary
# ---------------------------------------------------------------------------

def summarize(trace_dir, top=25, plane_filter=''):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, '**', '*.xplane.pb'), recursive=True))
    if not paths:
        print(json.dumps({'error': 'no xplane.pb under ' + trace_dir}))
        return 1
    out = []
    for path in paths:
        for name, lines, emeta, smeta in parse_xspace(path):
            if plane_filter and plane_filter.lower() not in name.lower():
                continue
            # device planes nest parent lines (Steps / XLA Modules) above
            # the per-op 'XLA Ops' line — summing every line double-counts,
            # so keep only the op line when present
            op_lines = [le for le in lines if le[0] == 'XLA Ops']
            use_lines = op_lines or lines

            def _resolve(sval):
                if isinstance(sval, tuple) and sval[0] == 'ref':
                    sval = smeta.get(sval[1], '')
                return sval if isinstance(sval, str) else ''

            by_op = defaultdict(int)
            cat_of = {}
            for line_name, events in use_lines:
                for mid, dur, stats in events:
                    op, mstats = emeta.get(mid, ('meta_{0}'.format(mid), []))
                    by_op[op] += dur
                    # static per-op info rides on the event METADATA stats
                    # (TPU planes); fall back to per-event stats (CPU planes)
                    for smid, sval in list(mstats) + list(stats):
                        if op in cat_of:
                            break
                        if smeta.get(smid) in ('hlo_category', 'category',
                                               'equation'):
                            sval = _resolve(sval)
                            if sval:
                                cat_of[op] = sval
            if not by_op:
                continue
            total_ps = sum(by_op.values())
            by_cat = defaultdict(int)
            for op, d in by_op.items():
                by_cat[cat_of.get(op, 'uncategorized')] += d
            ops = sorted(by_op.items(), key=lambda kv: -kv[1])[:top]
            out.append({
                'file': os.path.basename(path),
                'plane': name,
                'total_ms': round(total_ps / 1e9, 3),
                'categories': {
                    k: round(100.0 * v / max(total_ps, 1), 1)
                    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])},
                'ops': [{'name': op[:120],
                         'ms': round(d / 1e9, 3),
                         'pct': round(100.0 * d / max(total_ps, 1), 1),
                         'category': cat_of.get(op, '')}
                        for op, d in ops],
            })
    for rec in out:
        print(json.dumps(rec))
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('trace_dir')
    ap.add_argument('--top', type=int, default=25)
    ap.add_argument('--plane', default='',
                    help='substring filter on plane name (e.g. TPU)')
    opts = ap.parse_args()
    sys.exit(summarize(opts.trace_dir, opts.top, opts.plane))


if __name__ == '__main__':
    main()
