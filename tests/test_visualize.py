"""--eval attention-figure generation end-to-end (VERDICT r1 next-step #10).

The reference's --eval mode re-runs correct test examples and writes
per-(layer, head) attention PDFs under figures/<qid>/head<j>/attention<i>.pdf
(main.py:365-380, utils.py:127-284). This drives the same path on the
synthetic corpus and checks the attention tensor shapes and artifact files.
"""

import os

import pytest

from multimodalpromptretrieval_tpu.data.synthetic import (
    generate_synthetic_slake,
    synthetic_config,
)
from multimodalpromptretrieval_tpu.train.experiment import Experiment
from multimodalpromptretrieval_tpu.train.visualize import (
    attention_maps,
    visualize_attn_weights,
    visualize_correct_ids,
)


@pytest.fixture(scope="module")
def exp(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("viz"))
    generate_synthetic_slake(os.path.join(root, "SLAKE"), n_train=8,
                             n_validate=8, n_test=8, image_size=32, seed=0)
    cfg = synthetic_config(root, batch_size=8, epochs=1, image_size=32)
    cfg["clip_overrides"]["image_resolution"] = 32
    cfg["clip_overrides"]["patch_size"] = 16
    paths = dict(log_root=os.path.join(root, "logs"),
                 model_root=os.path.join(root, "models"))
    e = Experiment(cfg, train_mode=True, quiet=True, **paths)
    e.train()
    e2 = Experiment(cfg, train_mode=False, quiet=True, **paths)
    e2.test()  # writes logs/correct_ids.txt for the --eval driver
    return e2


def test_attention_tensor_shapes(exp):
    entry = exp.dataset_test.entries[0]
    maps = attention_maps(exp, entry)
    cfg = exp.model_cfg
    P = cfg.num_image_tokens
    L_in = P + len(maps["input_ids"])
    enc = maps["encoder_attentions"]   # (L, B, H, Lq, Lk)
    assert enc.shape == (cfg.t5.num_layers, 1, cfg.t5.num_heads, L_in, L_in)
    cross = maps["cross_attentions"]
    assert cross.shape[:3] == (cfg.t5.num_decoder_layers, 1,
                               cfg.t5.num_heads)
    assert cross.shape[4] == L_in   # keys = encoder positions
    assert isinstance(maps["predicted_answer"], str)


def test_eval_writes_figures_for_qid(exp, tmp_path):
    entry = exp.dataset_test.entries[0]
    figroot = str(tmp_path / "figures")
    n = visualize_correct_ids(exp, qid=entry["question_id"],
                              figures_root=figroot)
    cfg = exp.model_cfg
    assert n == cfg.t5.num_decoder_layers * cfg.t5.num_heads
    # reference layout: figures/<qid>/head<j>/attention<i>.pdf
    for j in range(cfg.t5.num_heads):
        for i in range(cfg.t5.num_decoder_layers):
            p = os.path.join(figroot, str(entry["question_id"]),
                             f"head{j}", f"attention{i}.pdf")
            assert os.path.exists(p) and os.path.getsize(p) > 0


def test_eval_iterates_correct_ids(exp, tmp_path):
    figroot = str(tmp_path / "figures2")
    n = visualize_correct_ids(exp, figures_root=figroot, limit=1)
    cfg = exp.model_cfg
    assert n == cfg.t5.num_decoder_layers * cfg.t5.num_heads
    assert os.listdir(figroot)


def test_encoder_attention_figures(exp, tmp_path):
    entry = exp.dataset_test.entries[1]
    figroot = str(tmp_path / "figures3")
    n = visualize_attn_weights(exp, entry,
                               attn_type="encoder_attentions",
                               figures_root=figroot)
    cfg = exp.model_cfg
    assert n == cfg.t5.num_layers * cfg.t5.num_heads


def test_rn_path_figures(tmp_path):
    """The RN prefix has no CLS and a stride-32 grid; the viz must use the
    no-CLS layout (grid = sqrt(P), no token sliced off) and still write
    every (layer, head) figure."""
    root = str(tmp_path)
    generate_synthetic_slake(os.path.join(root, "SLAKE"), n_train=8,
                             n_validate=8, n_test=8, image_size=32, seed=0)
    cfg = synthetic_config(root, batch_size=8, epochs=1, image_size=32)
    cfg["clip_overrides"]["image_resolution"] = 32
    cfg["clip_overrides"]["patch_size"] = 16
    cfg["vision_encoder"] = "RN50"
    cfg["resnet_overrides"] = {"layers": [1, 1, 1, 1], "width": 16,
                               "embed_dim": 32, "heads": 2}
    exp = Experiment(cfg, train_mode=False, quiet=True,
                     log_root=os.path.join(root, "logs"),
                     model_root=os.path.join(root, "models"))
    assert exp.model_cfg.resnet is not None
    entry = exp.dataset_test.entries[0]
    figroot = str(tmp_path / "figs")
    n = visualize_attn_weights(exp, entry, figures_root=figroot)
    tcfg = exp.model_cfg.t5
    assert n == tcfg.num_decoder_layers * tcfg.num_heads
    qid = str(entry["question_id"])
    assert os.path.exists(os.path.join(figroot, qid, "head0",
                                       "attention0.pdf"))
