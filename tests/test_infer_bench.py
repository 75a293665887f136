"""tools/infer_bench.py drives the serving eval forward (the artifact
export path) through a scanned multi-forward dispatch; run it end-to-end
at tiny shapes on the fake mesh and validate the reported JSON."""

import json
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tools'))


def test_infer_bench_tiny(monkeypatch, capsys):
    import infer_bench

    monkeypatch.setattr(sys, 'argv', [
        'infer_bench.py', '--model', 'deeplabv2', '--backbone', 'resnet10',
        '--im-size', '32', '--num-classes', '4', '--batch', '1',
        '--scan', '2', '--calls', '1', '--bf16', '0'])
    infer_bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rec['model'] == 'deeplabv2'
    assert rec['batch_per_chip'] == 1
    assert rec['images_per_sec_per_chip'] > 0
    assert rec['latency_ms_per_batch'] > 0


def test_infer_bench_extra_overrides(monkeypatch, capsys):
    import infer_bench

    monkeypatch.setattr(sys, 'argv', [
        'infer_bench.py', '--model', 'pspnet', '--backbone', 'resnet10',
        '--im-size', '32', '--num-classes', '4', '--batch', '1',
        '--scan', '2', '--calls', '1', '--bf16', '0',
        '--extra', '{"output_stride": 8}'])
    infer_bench.main()
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec['output_stride'] == 8
    assert rec['images_per_sec_per_chip'] > 0
