"""Build ImageSets/Segmentation/train_aug.txt.

Re-design of reference task/sseg/dataset/PascalVOC/tool/
list_augtrain_samples.py:1-23: every sample with a SegmentationClassAug
label that is not in the val split becomes an augmented-train sample.
"""

import os
import sys


def main(voc_root):
    label_dir = os.path.join(voc_root, 'SegmentationClassAug')
    sets_dir = os.path.join(voc_root, 'ImageSets', 'Segmentation')
    with open(os.path.join(sets_dir, 'val.txt')) as f:
        val = {l.strip() for l in f if l.strip()}

    names = sorted(os.path.splitext(f)[0]
                   for f in os.listdir(label_dir) if f.endswith('.png'))
    train_aug = [n for n in names if n not in val]

    out = os.path.join(sets_dir, 'train_aug.txt')
    with open(out, 'w') as f:
        f.write('\n'.join(train_aug) + '\n')
    print('wrote {0} samples to {1}'.format(len(train_aug), out))


if __name__ == '__main__':
    main(sys.argv[1])
