"""CLI driver — same verbs and config schema as the reference's main.py.

    python main.py --train  --config config/experiment.json
    python main.py --resume --config config/experiment.json
    python main.py --test   --config config/experiment.json
    python main.py --eval   --config config/experiment.json --qid 1234
    [--model_file models/foo.npz]

``--gpu_id`` is accepted for drop-in compatibility and ignored: device
selection is JAX's (the TPU mesh is discovered automatically;
``JAX_PLATFORMS=cpu`` forces CPU).
"""

from __future__ import annotations

import argparse
import json


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--train", help="train a model", action="store_true")
    p.add_argument("--resume", help="Resume model training",
                   action="store_true")
    p.add_argument("--test", help="test a model", action="store_true")
    p.add_argument("--eval", help="evaluate a model", action="store_true")
    p.add_argument("--config", help="config file name in the config folder")
    p.add_argument("--gpu_id", help="ignored (TPU mesh is auto-discovered)")
    p.add_argument("--model_file",
                   help="optional path to model to save/load")
    p.add_argument("--qid", help="Question ID to analyze")
    p.add_argument("--platform",
                   help="force a JAX platform (e.g. cpu); needed because the"
                   " session may pre-pin a TPU platform before argv parsing")
    # multi-host: run the same command on every host with its process id
    # (parallel/multihost.py). Omitted values fall back to JAX's env /
    # cluster auto-detection (JAX_COORDINATOR_ADDRESS, ...).
    p.add_argument("--coordinator",
                   help="host:port of process 0; enables multi-host mode")
    p.add_argument("--num_processes", type=int,
                   help="number of processes in the multi-host job")
    p.add_argument("--process_id", type=int,
                   help="this process's rank in the multi-host job")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if (args.coordinator or args.num_processes is not None
            or args.process_id is not None):
        from multimodalpromptretrieval_tpu.parallel import multihost

        multihost.initialize(args.coordinator, args.num_processes,
                             args.process_id, platform=args.platform)
    elif args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    with open(args.config) as f:
        cfg = json.load(f)

    from multimodalpromptretrieval_tpu.train.experiment import Experiment

    exp = Experiment(cfg, train_mode=args.train or args.resume,
                     model_file=args.model_file)
    if args.train or args.resume:
        exp.train(resume=args.resume)
    if args.test:
        exp.test()
    if args.eval:
        import os

        from multimodalpromptretrieval_tpu.train import checkpoint as ckpt
        from multimodalpromptretrieval_tpu.train.visualize import (
            visualize_correct_ids,
        )

        if os.path.exists(exp.model_path):
            exp.params, _, _ = ckpt.load_checkpoint(
                exp.model_path, exp.params)
        visualize_correct_ids(exp, qid=args.qid)


if __name__ == "__main__":
    main()
