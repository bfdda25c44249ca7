"""CLI --serve verb: JSONL request/answer streaming (cli.serve_stream).

The reference's only entry point is batch evaluation (main.py --test);
the serve verb is framework-native. These tests pin the protocol
(ordering, batching across chunk boundaries, image_name vs image-path
requests, the int8 flag) against direct MPRServer answers.
"""

import io
import json
import os

import numpy as np
import pytest

from multimodalpromptretrieval_tpu import cli
from multimodalpromptretrieval_tpu.data.synthetic import (
    generate_synthetic_slake,
    synthetic_config,
)
from multimodalpromptretrieval_tpu.serve import MPRServer
from multimodalpromptretrieval_tpu.train.experiment import Experiment


@pytest.fixture(scope="module")
def exp(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli_serve"))
    generate_synthetic_slake(os.path.join(root, "SLAKE"), n_train=16,
                             n_validate=8, n_test=8, image_size=32, seed=0)
    cfg = synthetic_config(root, batch_size=4, epochs=1, image_size=32,
                           retrieval=True, k=1)
    cfg["clip_overrides"]["image_resolution"] = 32
    cfg["clip_overrides"]["patch_size"] = 16
    cfg["cache_retrieval"] = False
    return Experiment(cfg, train_mode=False, quiet=True,
                      log_root=os.path.join(root, "logs"),
                      model_root=os.path.join(root, "models"))


def _requests(exp, n):
    entries = (exp.dataset_test.entries * 3)[:n]
    return [{"question": e["question"], "task": e["task"],
             "image_name": e["image_name"]} for e in entries], entries


def test_serve_stream_matches_direct_server(exp):
    reqs, entries = _requests(exp, 9)  # crosses batch boundaries (B=4)
    out = io.StringIO()
    total = cli.serve_stream(
        exp, io.StringIO("".join(json.dumps(r) + "\n" for r in reqs)), out)
    assert total == 9
    answers = [json.loads(line)["answer"]
               for line in out.getvalue().splitlines()]
    server = MPRServer(exp)
    images = np.stack([exp.images[e["image_name"]] for e in entries])
    ref = server.answer(images, [e["question"] for e in entries],
                        [e["task"] for e in entries],
                        image_ids=[e["image_name"] for e in entries])
    assert answers == ref


def test_serve_stream_image_path_request(exp):
    """An 'image' file-path request must answer like the equivalent
    cache-resident 'image_name' request (same preprocessed pixels)."""
    e = exp.dataset_test.entries[0]
    path = os.path.join(exp.cfg["datafolder"], "SLAKE", "imgs",
                        e["image_name"])
    assert os.path.exists(path)
    by_path = io.StringIO(json.dumps(
        {"question": e["question"], "task": e["task"],
         "image": path}) + "\n")
    by_name = io.StringIO(json.dumps(
        {"question": e["question"], "task": e["task"],
         "image_name": e["image_name"]}) + "\n")
    out1, out2 = io.StringIO(), io.StringIO()
    cli.serve_stream(exp, by_path, out1)
    cli.serve_stream(exp, by_name, out2)
    assert out1.getvalue() == out2.getvalue()


def test_serve_stream_int8(exp):
    reqs, _ = _requests(exp, 5)
    out = io.StringIO()
    total = cli.serve_stream(
        exp, io.StringIO("".join(json.dumps(r) + "\n" for r in reqs)),
        out, quantize="int8")
    assert total == 5
    for line in out.getvalue().splitlines():
        assert isinstance(json.loads(line)["answer"], str)


def test_serve_stream_rejects_imageless_request(exp):
    with pytest.raises(ValueError, match="image"):
        cli.serve_stream(
            exp, io.StringIO(json.dumps({"question": "?"}) + "\n"),
            io.StringIO())


def test_build_parser_has_serve_flags():
    p = cli.build_parser()
    args = p.parse_args(["--serve", "--config", "x.json",
                         "--requests", "r.jsonl", "--quantize", "int8"])
    assert args.serve and args.requests == "r.jsonl"
    assert args.quantize == "int8"
