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
    p.add_argument("--serve", action="store_true",
                   help="answer JSONL requests from stdin (or --requests): "
                        'one object per line {"question": ..., "task": '
                        '"open", "image_name": <name in the dataset image '
                        'cache> | "image": <image file path>}; answers '
                        'stream to stdout as {"answer": ...} in order')
    p.add_argument("--requests",
                   help="serve: read requests from this JSONL file "
                        "instead of stdin")
    p.add_argument("--quantize", choices=["int8", "int8_all"],
                   help="serve with int8 W8A8 quantized weights "
                        "(ops/quant; 'int8' keeps retrieval ranks "
                        "fp-identical)")
    p.add_argument("--spec-decode", type=int, default=0,
                   help="serve: hint-draft speculative decode block size "
                        "(0 = lockstep greedy; answers identical either "
                        "way — models/t5.t5_spec_greedy_decode)")
    p.add_argument("--length-sort", action="store_true",
                   help="serve: re-chunk each request by predicted "
                        "answer length (serve.MPRServer length_sort; "
                        "answers stay in request order)")
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


def serve_stream(exp, stream, out, quantize=None,
                 spec_decode: int = 0, length_sort: bool = False) -> int:
    """Drive :class:`serve.MPRServer` over a JSONL request stream.

    Each input line is one request: ``{"question": str, "task": str
    (default "open"), "image_name": <name in the dataset's preprocessed
    image cache> | "image": <path to an image file>}``. Responses stream
    to ``out`` in request order, one line per request: ``{"answer": str}``
    on success, ``{"error": str}`` for a request that could not be served
    (malformed JSON, missing/invalid fields, unknown image_name,
    unreadable image file). A bad request never takes down the stream or
    the other requests in its batch. Requests are batched to the
    experiment's batch size and pipelined (submit/result), so a long
    stream runs at the benchmarked serving throughput. Returns the number
    of response lines written (answers + errors).

    The reference has no serving surface (its only entry point is batch
    evaluation, main.py --test); this is framework-native.
    """
    import json as _json

    import numpy as np

    from multimodalpromptretrieval_tpu.serve import MPRServer

    server = MPRServer(exp, quantize=quantize, pipeline_depth=2,
                       spec_decode=spec_decode, length_sort=length_sort)
    size = exp.model_cfg.clip.image_resolution
    path_cache: dict = {}

    def resolve(req):
        name = req.get("image_name")
        if name is not None:
            return name, exp.images[name]
        path = req.get("image")
        if path is None:
            raise ValueError("request needs 'image_name' or 'image'")
        if path not in path_cache:
            from PIL import Image

            from multimodalpromptretrieval_tpu.ops.image import (
                preprocess_pil_images,
            )

            with Image.open(path) as im:
                if im.mode != "RGB":
                    im = im.convert("RGB")
                path_cache[path] = preprocess_pil_images(
                    [im.copy()], size=size)[0]
            # bounded: a long-running stream over many distinct files
            # would otherwise accumulate preprocessed arrays (~600 KB
            # each at 224px) for the life of the process
            while len(path_cache) > 4096:
                path_cache.pop(next(iter(path_cache)))
        return path, path_cache[path]

    def parse(line: str):
        """-> ("ok", id, img, question, task) | ("err", message).

        The broad except is deliberate: this is the protocol boundary of
        a long-running server, and any per-request failure (bad JSON,
        missing fields, unknown image_name, PIL decode error) must become
        an in-order {"error": ...} response, not a process crash."""
        try:
            req = _json.loads(line)
            if not isinstance(req, dict):
                raise ValueError("request must be a JSON object")
            q = req.get("question")
            if not isinstance(q, str) or not q:
                raise ValueError("request needs a non-empty string "
                                 "'question'")
            task = req.get("task", "open")
            if not isinstance(task, str):
                raise ValueError("'task' must be a string")
            rid, img = resolve(req)
            return ("ok", rid, img, q, task)
        except Exception as e:  # noqa: BLE001 — see docstring
            return ("err", f"{type(e).__name__}: {e}")

    B = exp.batch_size
    pending: list = []  # (AnswerHandle | None, per-row error layout)
    total = 0

    def emit(handle, layout):
        nonlocal total
        answers = iter(handle.result()) if handle is not None else iter(())
        for err in layout:
            out.write(_json.dumps({"answer": next(answers)} if err is None
                                  else {"error": err}) + "\n")
            total += 1
        out.flush()

    def flush(buf):
        ok = [b for b in buf if b[0] == "ok"]
        layout = [None if b[0] == "ok" else b[1] for b in buf]
        h = None
        if ok:
            _, ids, imgs, qs, tasks = zip(*ok)
            h = server.submit(np.stack(imgs), list(qs), list(tasks),
                              image_ids=list(ids))
        pending.append((h, layout))

    buf: list = []
    for line in stream:
        line = line.strip()
        if not line:
            continue
        buf.append(parse(line))
        if len(buf) < B:
            continue
        flush(buf)
        buf = []
        while len(pending) > 1:  # keep one request in flight
            emit(*pending.pop(0))
    if buf:
        flush(buf)
    for h, layout in pending:
        emit(h, layout)
    return total


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
    if args.serve:
        import sys

        stream = open(args.requests) if args.requests else sys.stdin
        try:
            serve_stream(exp, stream, sys.stdout, quantize=args.quantize,
                         spec_decode=args.spec_decode,
                         length_sort=args.length_sort)
        finally:
            if args.requests:
                stream.close()
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
