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
    """A request with neither image_name nor image answers with an
    in-order error line (fault isolation), not a stream crash."""
    out = io.StringIO()
    total = cli.serve_stream(
        exp, io.StringIO(json.dumps({"question": "?"}) + "\n"), out)
    assert total == 1
    (row,) = [json.loads(x) for x in out.getvalue().splitlines()]
    assert "image" in row["error"]


def test_build_parser_has_serve_flags():
    p = cli.build_parser()
    args = p.parse_args(["--serve", "--config", "x.json",
                         "--requests", "r.jsonl", "--quantize", "int8"])
    assert args.serve and args.requests == "r.jsonl"
    assert args.quantize == "int8"


def test_serve_stream_isolates_bad_requests(exp):
    """One bad line must produce an in-order {"error": ...} response and
    leave every valid request's answer unchanged — a production stream
    can't be taken down by a malformed request."""
    reqs, entries = _requests(exp, 6)
    lines = [json.dumps(r) for r in reqs]
    # inject failures at positions 1, 3, 4: bad JSON, unknown image_name,
    # missing question (also covers a non-dict JSON value at the end)
    lines.insert(1, "{not json")
    lines.insert(3, json.dumps({"question": "q?", "task": "open",
                                "image_name": "no-such-image.png"}))
    lines.insert(4, json.dumps({"task": "open",
                                "image_name": entries[0]["image_name"]}))
    lines.append("42")
    out = io.StringIO()
    total = cli.serve_stream(exp, io.StringIO("\n".join(lines) + "\n"), out)
    rows = [json.loads(x) for x in out.getvalue().splitlines()]
    assert total == len(rows) == len(lines)
    errs = {i for i, r in enumerate(rows) if "error" in r}
    assert errs == {1, 3, 4, len(lines) - 1}
    for i in errs:
        assert isinstance(rows[i]["error"], str) and rows[i]["error"]
    # valid rows answer exactly like an all-valid stream
    clean = io.StringIO()
    cli.serve_stream(
        exp, io.StringIO("".join(json.dumps(r) + "\n" for r in reqs)),
        clean)
    want = [json.loads(x)["answer"] for x in clean.getvalue().splitlines()]
    got = [r["answer"] for i, r in enumerate(rows) if i not in errs]
    assert got == want
