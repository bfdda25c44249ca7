"""Config utilities shared by the CLI driver.

``get_model_prefix`` reproduces the reference's config→name mangling
character for character (utils.py:16-55) so checkpoint / log artifact names
are drop-in compatible.
"""

from __future__ import annotations

from typing import Any, Dict


def get_model_prefix(cfg: Dict[str, Any]) -> str:
    data_name = cfg["dataset"]
    use_image_info = bool(cfg["use_image_info"])

    prefix = f"model_{data_name}"
    prefix += "_with_vision" if use_image_info else "_no_vision"
    prefix += ("_with_pretrained_checkpoint" if cfg.get("vision_checkpoint")
               else "_no_pretrained_checkpoint")
    if cfg.get("fewshot_training_tasks", {}) and \
            cfg["fewshot_training_tasks"].get("enabled"):
        prefix += "_fewshot"
    if cfg.get("mapping_checkpoint"):
        prefix += "_with_mapping"
    if cfg.get("use_prediction_head"):
        prefix += "_pred_head_BAN" if cfg.get("use_BAN") else "_pred_head"
    if cfg.get("freeze"):
        prefix += "_freeze"
    if cfg.get("retrieval"):
        prefix += "_retrieval"
    if "RN" in cfg.get("vision_encoder", ""):
        prefix += "_resnet"
    if "quantifier" in cfg and not cfg["quantifier"]:
        prefix += "_no_quantifier"
    return prefix


def cosine_similarity(a, b):
    """Row-wise cosine similarity. API-parity note: the reference defines
    this in utils.py:57-62 and imports it from T5VisionModel.py:7 but never
    calls it (dead — SURVEY.md component #2); kept for drop-in users."""
    import jax.numpy as jnp

    a = jnp.asarray(a)
    b = jnp.asarray(b)
    num = jnp.sum(a * b, axis=-1)
    den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
    return num / jnp.maximum(den, 1e-12)


def get_validation_loss(experiment, batches=None):
    """Reference utils.py:78-87 API shim: mean validation loss via the
    experiment's jitted eval step."""
    if batches is None:
        batches = experiment.make_split_batches(
            experiment.dataset_validate, "validate")
    return experiment.validation_loss(batches)
