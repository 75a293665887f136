"""Generate random labeled-subset prefix files.

Re-design of reference task/sseg/dataset/PascalVOC/tool/
random_sublabeled_samples.py:1-31: sample a random subset of train_aug
names at a given ratio and write one prefix per line. The reference ships 3
fixed splits per ratio (1/16, 1/8, 1/4, 1/2 → 662/1323/2645/5292 names,
sublabeled_prefix/{ratio}/{0,1,2}.txt); to reproduce the published
benchmarks bit-exactly, copy those files from an upstream PixelSSL checkout
— this tool regenerates statistically equivalent splits with a seed.

Usage: python random_sublabeled_samples.py <voc_root> <out_dir> \
           [--ratios 16,8,4,2] [--splits 3] [--seed 0]
"""

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('voc_root')
    p.add_argument('out_dir')
    p.add_argument('--ratios', default='16,8,4,2',
                   help='denominators: 16 → 1/16 labeled')
    p.add_argument('--splits', type=int, default=3)
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args()

    with open(os.path.join(args.voc_root, 'ImageSets', 'Segmentation',
                           'train_aug.txt')) as f:
        names = [l.strip() for l in f if l.strip()]

    for denom in (int(r) for r in args.ratios.split(',')):
        n_labeled = len(names) // denom
        for split in range(args.splits):
            rng = np.random.default_rng((args.seed, denom, split))
            chosen = sorted(rng.choice(names, size=n_labeled, replace=False))
            out_dir = os.path.join(args.out_dir, '1-{0}'.format(denom))
            os.makedirs(out_dir, exist_ok=True)
            out = os.path.join(out_dir, '{0}.txt'.format(split))
            with open(out, 'w') as f:
                f.write('\n'.join(chosen) + '\n')
            print('wrote {0} ({1} names)'.format(out, n_labeled))


if __name__ == '__main__':
    main()
