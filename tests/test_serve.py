"""MPRServer: programmatic end-to-end answering on the synthetic dataset."""

import os

import numpy as np
import pytest

from multimodalpromptretrieval_tpu.data.synthetic import (
    generate_synthetic_slake,
    synthetic_config,
)
from multimodalpromptretrieval_tpu.serve import MPRServer
from multimodalpromptretrieval_tpu.train.experiment import Experiment


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("serve"))
    generate_synthetic_slake(os.path.join(root, "SLAKE"), n_train=16,
                             n_validate=8, n_test=8, image_size=32, seed=0)
    cfg = synthetic_config(root, batch_size=4, epochs=1, image_size=32,
                           retrieval=True, k=2)
    cfg["clip_overrides"]["image_resolution"] = 32
    cfg["clip_overrides"]["patch_size"] = 16
    cfg["cache_retrieval"] = False
    paths = dict(log_root=os.path.join(root, "logs"),
                 model_root=os.path.join(root, "models"))
    exp = Experiment(cfg, train_mode=True, quiet=True, **paths)
    exp.train()
    exp2 = Experiment(cfg, train_mode=False, quiet=True, **paths)
    return exp2


def test_server_answers_arbitrary_request_sizes(trained):
    server = MPRServer(trained)
    entries = trained.dataset_test.entries[:5]  # odd size < and > batch
    images = np.stack([trained.images[e["image_name"]] for e in entries])
    questions = [e["question"] for e in entries]
    tasks = [e["task"] for e in entries]
    answers = server.answer(images, questions, tasks)
    assert len(answers) == 5
    for a in answers:
        assert isinstance(a, str)


def test_server_image_dedup_matches_plain_path(trained):
    """image_ids dedup (shared ViT prefix per unique image) must not change
    the answers, across multiple dispatched batches (batch_size=4, 9 rows)."""
    server = MPRServer(trained)
    entries = (trained.dataset_test.entries * 2)[:9]  # repeats share images
    images = np.stack([trained.images[e["image_name"]] for e in entries])
    questions = [e["question"] for e in entries]
    tasks = [e["task"] for e in entries]
    plain = server.answer(images, questions, tasks)
    dedup = server.answer(images, questions, tasks,
                          image_ids=[e["image_name"] for e in entries])
    assert plain == dedup


def test_server_without_retrieval(trained):
    # hints off: server still answers (empty hint)
    idx = trained.retrieval_index
    trained.retrieval_index = None
    try:
        server = MPRServer(trained, load_checkpoint=False)
        entries = trained.dataset_test.entries[:2]
        images = np.stack([trained.images[e["image_name"]]
                           for e in entries])
        answers = server.answer(images, [e["question"] for e in entries])
        assert len(answers) == 2
    finally:
        trained.retrieval_index = idx


def test_server_staged_images_skip_upload_and_match(trained):
    """stage_images caches device-side embedding/prefix tables; answers
    must match the unstaged path, and the staged call must not read the
    images argument at all."""
    server = MPRServer(trained)
    entries = (trained.dataset_test.entries * 2)[:9]
    images = np.stack([trained.images[e["image_name"]] for e in entries])
    questions = [e["question"] for e in entries]
    tasks = [e["task"] for e in entries]
    ids = [e["image_name"] for e in entries]
    cold = server.answer(images, questions, tasks, image_ids=ids)

    server.stage_images(images, ids)
    staged = server.answer(None, questions, tasks, image_ids=ids)
    assert staged == cold

    # unknown id -> falls back to encoding the provided images
    extra_ids = ids[:-1] + ["never-staged"]
    fallback = server.answer(images, questions, tasks, image_ids=extra_ids)
    assert len(fallback) == len(questions)


def test_submit_result_pipelining_matches_serial(trained):
    """submit()/result() with requests in flight must return the same
    answers as serial answer() calls, in submission order, with the
    queue fully drained afterwards."""
    server = MPRServer(trained)
    entries = (trained.dataset_test.entries * 2)[:9]
    images = np.stack([trained.images[e["image_name"]] for e in entries])
    questions = [e["question"] for e in entries]
    tasks = [e["task"] for e in entries]
    ids = [e["image_name"] for e in entries]
    server.stage_images(images, ids)
    serial = server.answer(None, questions, tasks, image_ids=ids)

    # two requests in flight before the first result() is taken
    h1 = server.submit(None, questions, tasks, image_ids=ids)
    h2 = server.submit(None, questions[:5], tasks[:5], image_ids=ids[:5])
    assert h1.result() == serial
    assert h1.done()
    assert h2.result() == serial[:5]
    assert server._queue == []

    # result() out of submission order still drains correctly
    h3 = server.submit(None, questions[:3], tasks[:3], image_ids=ids[:3])
    h4 = server.submit(None, questions, tasks, image_ids=ids)
    assert h4.result() == serial  # drains h3's chunks first
    assert h3.done() and h3.result() == serial[:3]
    assert server._queue == []


def test_empty_request_returns_empty(trained):
    """A zero-row request must return [] (not crash in image staging)."""
    server = MPRServer(trained)
    assert server.answer(np.zeros((0, 3, 32, 32), np.float32), [], []) == []
    h = server.submit(np.zeros((0, 3, 32, 32), np.float32), [], [])
    assert h.done() and h.result() == []


def test_pipeline_depth_two_matches_serial(trained):
    """A deeper in-flight queue must not change answers or ordering."""
    entries = (trained.dataset_test.entries * 3)[:13]
    images = np.stack([trained.images[e["image_name"]] for e in entries])
    questions = [e["question"] for e in entries]
    tasks = [e["task"] for e in entries]
    ids = [e["image_name"] for e in entries]
    base = MPRServer(trained).answer(images, questions, tasks,
                                     image_ids=ids)
    deep = MPRServer(trained, pipeline_depth=2)
    assert deep.answer(images, questions, tasks, image_ids=ids) == base
    h1 = deep.submit(images, questions, tasks, image_ids=ids)
    h2 = deep.submit(images, questions[:5], tasks[:5], image_ids=ids[:5])
    assert h1.result() == base and h2.result() == base[:5]
    assert deep._queue == []


@pytest.fixture(scope="module")
def classify_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("serve_cls"))
    generate_synthetic_slake(os.path.join(root, "SLAKE"), n_train=16,
                             n_validate=8, n_test=8, image_size=32, seed=0)
    return root


def _classify_exp(root, **kw):
    cfg = synthetic_config(root, batch_size=4, epochs=1, image_size=32,
                           retrieval=True, k=2)
    cfg["clip_overrides"]["image_resolution"] = 32
    cfg["clip_overrides"]["patch_size"] = 16
    cfg["cache_retrieval"] = False
    cfg.update(kw)
    return Experiment(cfg, train_mode=True, quiet=True,
                      log_root=os.path.join(root, "logs"),
                      model_root=os.path.join(root, "models"))


def test_ban_server_prompts_ignore_retrieval(classify_root):
    """The BAN variant's prompts never carry the retrieval hint (quirk #9,
    T5VisionModelPredictionHeadBAN.py:116-139): serving with the index
    present must answer identically to serving without it."""
    exp = _classify_exp(classify_root, use_prediction_head=1, use_BAN=1,
                        glimpse=10)
    entries = (exp.dataset_test.entries * 2)[:5]
    images = np.stack([exp.images[e["image_name"]] for e in entries])
    questions = [e["question"] for e in entries]
    tasks = [e["task"] for e in entries]
    with_index = MPRServer(exp, load_checkpoint=False).answer(
        images, questions, tasks)
    idx = exp.retrieval_index
    exp.retrieval_index = None
    try:
        without = MPRServer(exp, load_checkpoint=False).answer(
            images, questions, tasks)
    finally:
        exp.retrieval_index = idx
    assert with_index == without
    assert len(with_index) == 5


def test_prediction_head_server_chunked_hints_match_per_chunk(
        classify_root):
    """The classify-path _hints embed is chunked to batch_size (one
    un-chunked jit would recompile per request size and allocate the whole
    request's ViT activations): a 9-row request (3 chunks at B=4) must
    answer exactly like three separate aligned requests."""
    exp = _classify_exp(classify_root, use_prediction_head=1)
    entries = (exp.dataset_test.entries * 2)[:9]
    images = np.stack([exp.images[e["image_name"]] for e in entries])
    questions = [e["question"] for e in entries]
    tasks = [e["task"] for e in entries]
    server = MPRServer(exp, load_checkpoint=False)
    whole = server.answer(images, questions, tasks)
    parts = []
    for s in (0, 4, 8):
        parts += server.answer(images[s:s + 4], questions[s:s + 4],
                               tasks[s:s + 4])
    assert whole == parts
    assert len(whole) == 9


def test_server_answers_match_experiment_test_predictions(trained):
    """Cross-surface invariant: MPRServer.answer on the test split must
    reproduce Experiment.test()'s raw greedy predictions exactly — same
    checkpoint, same retrieval hints, same decode. Guards the serve
    pipeline (prefix staging, chunked retrieval dispatch, fused prompt
    path) against drifting from the evaluation path."""
    metrics = trained.test()  # loads the checkpoint into trained.params
    server = MPRServer(trained)  # re-loads the same checkpoint
    entries = trained.dataset_test.entries
    images = np.stack([trained.images[e["image_name"]] for e in entries])
    questions = [e["question"] for e in entries]
    tasks = [e["task"] for e in entries]
    answers = server.answer(images, questions, tasks)
    want = [metrics.predictions[(e["question_id"], e["task"])]
            for e in entries]
    assert answers == want
