"""CLI for the offline AI2-THOR episode-tree collector — the reference's
`python collect_ithor_tree_data.py train|test` surface."""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("split", choices=["train", "test"])
    ap.add_argument("--img_root", default=None)
    ap.add_argument("--ann_path", default=None)
    ap.add_argument("--num_anchors", type=int, default=None)
    args = ap.parse_args()
    img_root = args.img_root or f"data/interactron/{args.split}"
    ann_path = args.ann_path or f"data/interactron/annotations/interactron_v1_{args.split}.json"

    from interactron_tpu.collect.thor_collector import ThorCollector

    ThorCollector().collect_dataset(args.split, img_root, ann_path, args.num_anchors)


if __name__ == "__main__":
    main()
