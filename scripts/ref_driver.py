"""Run the ACTUAL reference driver (/root/reference/main.py) in this
environment, for the cross-framework parity run.

The reference's pip deps that are absent here are shimmed without touching
its code:
  * ``clip``            -> scripts/parity_shims/clip.py (torch CLIP with
                           OpenAI layout, loading weights exported from JAX)
  * ``T5Tokenizer``     -> wrapper around the framework's hermetic
                           sentencepiece tokenizer built from the same
                           corpus (so token ids are identical on both sides)
  * ``T5ForConditionalGeneration.from_pretrained`` -> constructs the real
                           HF torch model from the tiny parity T5Config
                           (weights come from the exported checkpoint via
                           main.py's own load_state_dict)

Everything else — datasets, retrieval, model code, metrics — is the
reference's own Python, byte for byte.

Usage (cwd = a scratch dir holding models/<prefix>.pt):
  PARITY_SPEC=<spec.json> python scripts/ref_driver.py --test --config <cfg>
"""

import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
_REF = os.environ.get("PARITY_REF", "/root/reference")

os.environ.setdefault("MPLBACKEND", "Agg")
# order matters: shims shadow the absent pip deps; the reference tree
# provides utils/dataset/architectures; dataset/ makes create_mapping.py's
# stale `from ROCO import ...` (create_mapping.py:10) resolve; the repo
# root provides the framework package for the tokenizer shims
sys.path[:0] = [os.path.join(_HERE, "parity_shims"), _REF,
                os.path.join(_REF, "dataset"), _REPO]

with open(os.environ["PARITY_SPEC"]) as f:
    SPEC = json.load(f)

import torch  # noqa: E402
import transformers  # noqa: E402
from transformers import BatchEncoding  # noqa: E402
from transformers import T5Config as HFT5Config  # noqa: E402
from transformers import (  # noqa: E402
    T5ForConditionalGeneration as RealT5ForConditionalGeneration,
)


class ShimT5Tokenizer:
    """The surface of HF T5Tokenizer that the reference touches
    (T5VisionModel.py:57-61,161-167,207,223-230), backed by the framework's
    T5SentencePieceTokenizer built from the shared parity corpus."""

    def __init__(self):
        from multimodalpromptretrieval_tpu.text import (
            T5SentencePieceTokenizer,
        )

        with open(SPEC["corpus"]) as f:
            corpus = json.load(f)
        self._tok = T5SentencePieceTokenizer.from_corpus(corpus)
        self.pad_token_id = self._tok.pad_id
        self.eos_token_id = self._tok.eos_id

    @classmethod
    def from_pretrained(cls, name, **kw):
        return cls()

    def __len__(self):
        return len(self._tok)

    def add_tokens(self, tokens):
        return self._tok.add_tokens(tokens)

    def convert_tokens_to_ids(self, token):
        return self._tok.convert_tokens_to_ids(token)

    def convert_ids_to_tokens(self, ids):
        out = []
        for i in ids:
            i = int(i)
            if i in self._tok._added_rev:
                out.append(self._tok._added_rev[i])
            elif i < self._tok.base_size:
                out.append(self._tok.vocab.pieces[i][0])
            else:
                out.append("<unk>")
        return out

    def __call__(self, texts, padding="longest", max_length=None,
                 truncation=False, return_tensors=None):
        if isinstance(texts, str):
            texts = [texts]
        ml = max_length if truncation else None
        encoded = [self._tok.encode(t, max_length=ml) for t in texts]
        width = max(len(e) for e in encoded) if padding == "longest" else \
            max_length
        ids = [e + [self._tok.pad_id] * (width - len(e)) for e in encoded]
        mask = [[1] * len(e) + [0] * (width - len(e)) for e in encoded]
        if return_tensors == "pt":
            return BatchEncoding({
                "input_ids": torch.tensor(ids, dtype=torch.long),
                "attention_mask": torch.tensor(mask, dtype=torch.long)})
        return BatchEncoding({"input_ids": ids, "attention_mask": mask})

    def batch_decode(self, sequences, skip_special_tokens=True):
        import numpy as np

        return self._tok.batch_decode(np.asarray(sequences),
                                      skip_special_tokens)


class ShimT5ForConditionalGeneration(RealT5ForConditionalGeneration):
    """Real HF T5; only from_pretrained is rerouted to the tiny parity
    config (no hub access in this environment). Weights are overwritten by
    main.py's load_state_dict from the exported checkpoint."""

    @classmethod
    def from_pretrained(cls, name, *args, **kw):
        return cls(HFT5Config(**SPEC["t5"]))


transformers.T5Tokenizer = ShimT5Tokenizer
transformers.T5ForConditionalGeneration = ShimT5ForConditionalGeneration


def _install_shims():
    """Re-bind T5Tokenizer / T5ForConditionalGeneration inside every
    reference module that imported them. Patching the ``transformers``
    top-level module is not enough: its 4.57 lazy-import machinery hands
    ``from transformers import T5Tokenizer`` a placeholder that ignores
    (and can clobber) the top-level patch, so the names are rewritten in
    the consumer modules' namespaces instead."""
    import importlib

    consumers = [
        "architectures.T5VisionModel",
        "architectures.T5VisionModelFrozen",
        "architectures.T5VisionModelPredictionHead",
        "architectures.T5VisionModelPredictionHeadBAN",
        "dataset.ROCO",
        "ROCO",  # create_mapping.py:10 imports it top-level too
    ]
    for name in consumers:
        try:
            mod = importlib.import_module(name)
        except ImportError:
            continue
        if hasattr(mod, "T5Tokenizer"):
            mod.T5Tokenizer = ShimT5Tokenizer
        if hasattr(mod, "T5ForConditionalGeneration"):
            mod.T5ForConditionalGeneration = ShimT5ForConditionalGeneration


_install_shims()

def _export_checkpoint(sd_npz: str, config_path: str, lr: float) -> None:
    """Build the reference model (its own classes), strict-load the
    JAX-exported state dict, and save the {model,optimizer}_state_dict
    checkpoint main.py expects (main.py:199-206 layout) at
    models/<prefix>.pt under the cwd.

    The class is selected exactly the way main.py:132-146 does it
    (use_prediction_head / use_BAN / freeze); the prediction-head class
    needs num_classes, recovered from the exported head weight itself so
    it always matches the ans2label space the weights were trained on."""
    import numpy as np

    from utils import get_model_prefix

    with open(config_path) as f:
        cfg = json.load(f)
    kw = dict(
        vision_encoder=cfg["vision_encoder"],
        T5_version=cfg["T5_version"],
        use_image_info=bool(cfg["use_image_info"]),
        vision_checkpoint=cfg.get("vision_checkpoint"),
        mapping_checkpoint=None, retrieval_function=None,
        use_quantifier=True)
    if cfg.get("use_prediction_head"):
        with np.load(sd_npz) as z:
            num_classes = z["prediction_head.weight"].shape[0]
        if cfg.get("use_BAN"):
            from architectures.T5VisionModelPredictionHeadBAN import (
                T5VisionModelPredictionHeadBAN,
            )

            model = T5VisionModelPredictionHeadBAN(
                "cpu", num_classes, glimpse=cfg.get("glimpse", 10), **kw)
        else:
            from architectures.T5VisionModelPredictionHead import (
                T5VisionModelPredictionHead,
            )

            model = T5VisionModelPredictionHead("cpu", num_classes, **kw)
    elif cfg.get("freeze"):
        from architectures.T5VisionModelFrozen import T5VisionModelFrozen

        model = T5VisionModelFrozen("cpu", **kw)
    else:
        from architectures.T5VisionModel import T5VisionModel

        model = T5VisionModel("cpu", **kw)
    with np.load(sd_npz) as z:
        sd = {k: torch.tensor(np.ascontiguousarray(z[k])) for k in z.files}
    model.load_state_dict(sd, strict=True)
    optimizer = torch.optim.AdamW(model.parameters(), lr=lr)
    path = os.path.join("models", get_model_prefix(cfg) + ".pt")
    os.makedirs("models", exist_ok=True)
    torch.save({"model_state_dict": model.state_dict(),
                "optimizer_state_dict": optimizer.state_dict()}, path)
    print(f"exported reference checkpoint: {path} ({len(sd)} tensors)")


if __name__ == "__main__":
    import runpy

    torch.set_num_threads(max(1, os.cpu_count() - 2))
    if len(sys.argv) > 1 and sys.argv[1] == "export":
        _export_checkpoint(sys.argv[2], sys.argv[3], float(sys.argv[4]))
    else:
        sys.argv[0] = os.path.join(_REF, "main.py")
        runpy.run_path(os.path.join(_REF, "main.py"), run_name="__main__")
