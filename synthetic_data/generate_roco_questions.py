"""CLI drop-in for the reference's synthetic_data/generate_roco_questions.py.

    python synthetic_data/generate_roco_questions.py <PATH_TO_ROCO_DATA> <SAVE_PATH>

Logic lives in multimodalpromptretrieval_tpu/data/roco_questions.py; the
default run reproduces the reference's output files (including its
write-location and all-rows-in-both-splits quirks — pass --fixed to get the
corrected behavior).
"""

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("roco_path", help="ROCO dataset root")
    p.add_argument("save_path", help="datafolder from your config")
    p.add_argument("--fixed", action="store_true",
                   help="honor the stratified split and write under ROCO/")
    p.add_argument("--seed", type=int, default=88)
    args = p.parse_args(argv)

    from multimodalpromptretrieval_tpu.data.roco_questions import (
        generate_roco_dataset,
    )

    rows = generate_roco_dataset(args.roco_path, args.save_path,
                                 seed=args.seed, faithful=not args.fixed)
    print(f"wrote {len(rows)} synthetic QA rows")


if __name__ == "__main__":
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
