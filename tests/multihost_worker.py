"""Subprocess worker for tests/test_multihost.py (not a test module).

Runs either a raw tiny train-step loop ("step") or a full synthetic
Experiment.train ("experiment") as one process of an N-process
jax.distributed cluster on the CPU platform (gloo collectives standing in
for DCN). Process 0 writes its results to --out for the parent test to
compare against a single-process run of the same program.
"""

import argparse
import json
import os
import sys

parser = argparse.ArgumentParser()
parser.add_argument("--mode", choices=["step", "experiment"], required=True)
parser.add_argument("--nproc", type=int, required=True)
parser.add_argument("--proc", type=int, required=True)
parser.add_argument("--port", type=int, required=True)
parser.add_argument("--devices", type=int, required=True,
                    help="virtual CPU devices for THIS process")
parser.add_argument("--out", required=True)
parser.add_argument("--root", help="synthetic dataset root (experiment)")
args = parser.parse_args()

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={args.devices}")

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodalpromptretrieval_tpu.parallel import multihost  # noqa: E402

if args.nproc > 1:
    multihost.initialize(f"127.0.0.1:{args.port}", args.nproc, args.proc,
                         platform="cpu")


def run_step_mode():
    import jax.numpy as jnp  # noqa: F401

    from multimodalpromptretrieval_tpu.models import mprgen
    from multimodalpromptretrieval_tpu.models.clip import CLIPConfig
    from multimodalpromptretrieval_tpu.models.t5 import T5Config
    from multimodalpromptretrieval_tpu.parallel import mesh as pmesh
    from multimodalpromptretrieval_tpu.train.optim import adamw_init

    cfg = mprgen.MPRGenConfig(
        t5=T5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=64,
                    num_layers=1, num_decoder_layers=1, num_heads=4),
        clip=CLIPConfig.tiny(), use_image_info=True)
    mesh = pmesh.get_mesh()
    params = pmesh.shard_params(
        mprgen.init_mprgen(jax.random.PRNGKey(0), cfg), mesh)
    opt = pmesh.shard_params(adamw_init(params), mesh)
    step = pmesh.make_train_step(cfg, mesh=mesh)
    rng = np.random.default_rng(0)
    B, R = 8, cfg.clip.image_resolution
    batch = {
        "images": rng.normal(size=(B, 3, R, R)).astype(np.float32),
        "input_ids": rng.integers(2, 128, size=(B, 8)).astype(np.int32),
        "text_mask": np.ones((B, 8), np.int32),
        "labels": rng.integers(2, 128, size=(B, 4)).astype(np.int64),
    }
    losses = []
    for i in range(3):
        gb = pmesh.shard_batch(batch, mesh)
        params, opt, loss = step(params, opt, gb, 1e-3,
                                 jax.random.PRNGKey(i))
        losses.append(float(loss))
    if multihost.is_primary():
        flat = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
                jax.tree_util.tree_leaves_with_path(params)}
        np.savez(args.out, **flat)
        with open(args.out + ".json", "w") as f:
            json.dump({"losses": losses,
                       "n_devices": jax.device_count()}, f)


def run_experiment_mode():
    from multimodalpromptretrieval_tpu.data.synthetic import (
        synthetic_config,
    )
    from multimodalpromptretrieval_tpu.train.experiment import Experiment

    cfg = synthetic_config(args.root, batch_size=8, epochs=2,
                           image_size=32, retrieval=True, k=2)
    cfg["clip_overrides"]["image_resolution"] = 32
    cfg["clip_overrides"]["patch_size"] = 16
    # the retrieval-index disk cache is shared between the processes of a
    # multi-host job; skip it rather than racing on the write
    cfg["cache_retrieval"] = False
    paths = dict(log_root=os.path.join(args.out, "logs"),
                 model_root=os.path.join(args.out, "models"))
    exp = Experiment(cfg, train_mode=True, quiet=True, **paths)
    res = exp.train()
    # only process 0 wrote the checkpoint; don't let others read it early
    multihost.barrier("checkpoint-written")
    # eval under the same cluster: every process computes the full metric
    # table from all-gathered predictions; only process 0 writes artifacts
    exp2 = Experiment(cfg, train_mode=False, quiet=True, **paths)
    metrics = exp2.test()
    if multihost.is_primary():
        with open(os.path.join(args.out, "result.json"), "w") as f:
            json.dump({"best_valid_loss": res["best_valid_loss"],
                       "n_devices": jax.device_count(),
                       "model_path": exp.model_path,
                       "overall": metrics.overall,
                       "n_scored": sum(metrics.total.values())}, f)


if args.mode == "step":
    run_step_mode()
else:
    run_experiment_mode()
multihost.shutdown()
