"""Pull the Prot2Text CSV splits — reference get_data.py:1-13.

Downloads `habdine/Prot2Text-Data` from the HF hub (requires network; this
image has zero egress, so point --local_dataset_dir at a local copy instead).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser("get_data")
    p.add_argument("--output_dir", type=str, default="./data")
    p.add_argument("--dataset_name", type=str,
                   default="habdine/Prot2Text-Data")
    p.add_argument("--local_dataset_dir", type=str, default=None)
    args = p.parse_args(argv)

    os.makedirs(args.output_dir, exist_ok=True)
    from datasets import load_dataset

    src = args.local_dataset_dir or args.dataset_name
    ds = load_dataset(src)
    for split in ("train", "validation", "test"):
        if split in ds:
            path = os.path.join(args.output_dir, f"{split}.csv")
            ds[split].to_csv(path)
            print(f"{split}: {len(ds[split])} rows → {path}")


if __name__ == "__main__":
    main()
