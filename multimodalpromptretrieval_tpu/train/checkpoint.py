"""Pytree checkpointing keyed by the reference's config-derived prefix.

The reference saves ``{'model_state_dict', 'optimizer_state_dict'}`` to
``models/<prefix>.pt`` on every new best validation loss (main.py:199-206).
Here the params + optimizer pytrees are flattened to path-keyed arrays in a
single ``.npz`` (portable, no torch/pickle needed to read back), with a
sidecar JSON for scalars/metadata.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k in sorted(tree):
            out.update(_flatten(tree[k], f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten_into(template, flat, prefix="", template_on_missing=False):
    if isinstance(template, dict):
        return {k: _unflatten_into(template[k], flat, f"{prefix}{k}/",
                                   template_on_missing)
                for k in template}
    if isinstance(template, (list, tuple)):
        seq = [_unflatten_into(v, flat, f"{prefix}{i}/",
                               template_on_missing)
               for i, v in enumerate(template)]
        return type(template)(seq)
    key = prefix[:-1]
    if key not in flat:
        # ``template_on_missing``: True allows any gap (legacy pre-marker
        # files); a set allows only keys the writer explicitly elided —
        # anything else stays a loud KeyError (truncated/mismatched file)
        if template_on_missing is True or (
                isinstance(template_on_missing, (set, frozenset))
                and key in template_on_missing):
            # elided all-zero optimizer moment (frozen param): the
            # template (adamw_init) already holds the zeros
            return np.asarray(template)
    return flat[key]


def _bf16():
    import ml_dtypes

    return np.dtype(ml_dtypes.bfloat16)


def save_checkpoint(path: str, params, opt_state=None,
                    metadata: Optional[Dict[str, Any]] = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {f"params/{k}": v for k, v in _flatten(params).items()}
    if opt_state is not None:
        elided = []
        for k, v in _flatten(opt_state).items():
            # Frozen params (e.g. the CLIP towers) keep all-zero AdamW
            # moments; the torch reference stores no optimizer state for
            # requires_grad=False params at all (main.py:199-206 saves the
            # optimizer's own state_dict), so elide them — load restores
            # the zeros from the template. Small leaves (step counters,
            # scalars) are always kept so a saved-opt checkpoint is
            # distinguishable from a params-only one.
            if v.size > 1024 and not np.any(v):
                elided.append(k)
                continue
            arrays[f"opt/{k}"] = v
        # explicit elision record: load treats ONLY these as
        # restore-from-template; any other missing key stays a KeyError
        arrays["__elided_opt__"] = np.asarray(json.dumps(elided))
    # bf16 leaves (adamw_moments_dtype "bfloat16"): npz's non-pickle
    # format can't represent ml_dtypes.bfloat16 (it loads back as void
    # "|V2", which jnp.asarray rejects) — store the raw bits as uint16
    # and record the keys so load views them back
    bf16_keys = [k for k, v in arrays.items()
                 if k != "__elided_opt__" and v.dtype == _bf16()]
    if bf16_keys:  # common fp32 checkpoints keep the pre-r5 key set
        for k in bf16_keys:
            arrays[k] = arrays[k].view(np.uint16)
        arrays["__bf16__"] = np.asarray(json.dumps(bf16_keys))
    np.savez(path, **arrays)
    if metadata is not None:
        with open(path + ".json", "w") as f:
            json.dump(metadata, f, indent=2)


def load_checkpoint(path: str, params_template,
                    opt_template=None) -> Tuple[Any, Any, Dict[str, Any]]:
    """Returns (params, opt_state-or-None, metadata)."""
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    import jax.numpy as jnp

    bf16_marker = flat.pop("__bf16__", None)
    if bf16_marker is not None:
        for k in json.loads(str(bf16_marker)):
            flat[k] = flat[k].view(_bf16())
    marker = flat.pop("__elided_opt__", None)
    # pre-marker files carry every key; True keeps them loading (any
    # genuinely missing key would have raised under the old strict code
    # only — acceptable legacy leniency, documented)
    allowed = set(json.loads(str(marker))) if marker is not None else True
    pflat = {k[len("params/"):]: v for k, v in flat.items()
             if k.startswith("params/")}
    # device arrays, not numpy: loaded params feed jitted fns (a numpy leaf
    # indexed by a tracer raises TracerArrayConversionError)
    try:
        params = jax.tree.map(jnp.asarray,
                              _unflatten_into(params_template, pflat))
    except KeyError as e:
        # the reference's get_model_prefix does NOT encode T5_version (or
        # d_model overrides), so a t5-large run can find a t5-small file
        # under the same name — surface what actually happened instead of
        # a bare KeyError from deep inside the unflatten recursion
        raise ValueError(
            f"checkpoint {path} does not match the model: parameter "
            f"{e.args[0]!r} is missing from the file. Was it written by "
            "a different T5_version / model variant under the same "
            "reference-compatible name?") from e
    opt_state = None
    if opt_template is not None:
        oflat = {k[len("opt/"):]: v for k, v in flat.items()
                 if k.startswith("opt/")}
        if oflat:
            # the TEMPLATE's dtype is authoritative for optimizer state:
            # the resume config decides ``adamw_moments_dtype``, so a
            # bf16-moment file resumed under the fp32 default is cast up
            # (and an fp32 file under a bf16 config cast down) instead
            # of silently keeping the file's dtype and letting
            # adamw_update key its storage rounding off the wrong one
            opt_state = jax.tree.map(
                lambda t, v: jnp.asarray(
                    v, dtype=getattr(t, "dtype", None)),
                opt_template,
                _unflatten_into(opt_template, oflat,
                                template_on_missing=allowed))
    metadata: Dict[str, Any] = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            metadata = json.load(f)
    return params, opt_state, metadata
