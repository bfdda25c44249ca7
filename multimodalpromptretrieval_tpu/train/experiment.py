"""Experiment driver: config → datasets → retrieval → model → train/test.

The TPU-native counterpart of the reference's ``main.py`` script, behind the
same JSON config schema (config/experiment.json, README.md:40-61) and the
same CLI verbs (bin ``main.py`` at the repo root). Differences are
TPU-architectural, not behavioral:

  * all device compute (CLIP, T5, retrieval k-NN, AdamW) lives in a handful
    of jitted steps over fixed shape buckets — no per-batch recompiles;
  * retrieval hints for a frozen CLIP + frozen corpus are precomputed per
    phase instead of re-embedding every batch inside the hot loop
    (main.py:178-179 re-runs CLIP twice per training batch; outputs are
    identical because the inputs are deterministic);
  * greedy generate in the train loop — the reference runs it on EVERY
    training batch and uses the result only for pred-head accuracy
    (main.py:179, quirk #5) — is gated on use_prediction_head (config key
    ``exact_train_predict`` restores the reference behavior);
  * data parallelism over the device mesh comes free through
    parallel/mesh.py shardings.
"""

from __future__ import annotations

import json
import os
import random
import time
import zlib
from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from multimodalpromptretrieval_tpu.data.batching import (
    Batch,
    encode_unique_chunks,
    make_batches,
)
from multimodalpromptretrieval_tpu.data.datasets import (
    VQADataset,
    create_ans2label,
    load_dataset,
)
from multimodalpromptretrieval_tpu.data.images import ImageCache
from multimodalpromptretrieval_tpu.models import mprgen
from multimodalpromptretrieval_tpu.models.clip import (
    CLIPConfig,
    clip_encode_image,
    clip_encode_text,
)
from multimodalpromptretrieval_tpu.models.t5 import T5Config
from multimodalpromptretrieval_tpu.parallel import mesh as pmesh
from multimodalpromptretrieval_tpu.parallel import multihost
from multimodalpromptretrieval_tpu.parallel import pipeline as ppipe
from multimodalpromptretrieval_tpu.parallel import sequence as pseq
from multimodalpromptretrieval_tpu.retrieval.index import RetrievalIndex
from multimodalpromptretrieval_tpu.text import (
    CLIPBPETokenizer,
    T5SentencePieceTokenizer,
)
from multimodalpromptretrieval_tpu.train import checkpoint as ckpt
from multimodalpromptretrieval_tpu.train.metrics import TestMetrics
from multimodalpromptretrieval_tpu.train import rng as rng_util
from multimodalpromptretrieval_tpu.train.optim import (
    ReduceLROnPlateau,
    adamw_init,
)
from multimodalpromptretrieval_tpu.utils import get_model_prefix


def tokenizer_corpus(dataset_train, dataset_validate,
                     dataset_test) -> List[str]:
    """The hermetic-tokenizer training corpus for a dataset triple.

    Module-level (not a method) so the cross-framework parity harness can
    build a byte-identical tokenizer for the reference driver's shims."""
    corpus = [e["question"] for e in dataset_train.entries]
    corpus += [e["answer"] for e in dataset_train.entries]
    corpus += [e["answer"] for e in dataset_validate.entries]
    corpus += [e["answer"] for e in dataset_test.entries]
    corpus += [f"Answer the {t} question: " for t in sorted(
        {e["task"] for e in dataset_train.entries})]
    corpus += ["I believe the answer is", "The most frequent answer",
               "very unlikely unlikely maybe likely very likely "
               "certainly"]
    return corpus


def load_filtered_triple(cfg: Dict[str, Any], folder: str, data_name: str):
    """(train, validate, test) datasets for ``data_name`` with every
    config-driven filter applied, in the reference's order
    (main.py:74-86): fewshot task filter, ``train_subset`` stratified
    subsampling, then ``max_answers`` across all three splits.

    Module-level so transfer evaluation can rebuild the SOURCE dataset's
    triple to reconstruct the training tokenizer (see Experiment.__init__).
    """
    dataset_train = load_dataset(folder, data_name, "train")
    fewshot = cfg.get("fewshot_training_tasks") or {}
    if fewshot.get("enabled"):
        # In the reference this key only alters the model prefix
        # (utils.py:31-35); the dataset.filter it pairs with
        # (VQAFeatureDataset.py:99-111) was driven manually. Here it is
        # wired: restrict the train split to the listed tasks, capped
        # per task.
        dataset_train.filter(
            fewshot.get("tasks", []),
            fewshot.get("examples_per_task", float("inf")))
    if "train_subset" in cfg:
        split = dataset_train.get_stratified_split(
            split_fraction=cfg["train_subset"])
        dataset_train.entries = [dataset_train.entries[x] for x in split]
    dataset_validate = load_dataset(folder, data_name, "validate")
    dataset_test = load_dataset(folder, data_name, "test")
    if cfg.get("max_answers"):
        answer_set = dataset_train.filter_max_answers(cfg["max_answers"])
        dataset_validate.filter_max_answers(
            cfg["max_answers"], set(answer_set))
        dataset_test.filter_max_answers(
            cfg["max_answers"], set(answer_set))
    return dataset_train, dataset_validate, dataset_test


class Experiment:
    def __init__(self, cfg: Dict[str, Any], *, train_mode: bool,
                 model_file: Optional[str] = None,
                 mesh=None, log_root: str = "logs",
                 model_root: str = "models", quiet: bool = False):
        self.cfg = cfg
        self.quiet = quiet
        self.log_root = log_root
        self.model_root = model_root
        if mesh is None:
            mesh = self._build_mesh(cfg)
        self.mesh = mesh
        # parallelism axes come from the mesh itself (a caller-passed mesh
        # wins over the config key): "model" -> Megatron TP over the T5
        # kernels, "pipe" -> GPipe PP over the layer stacks
        self.n_model = mesh.shape.get("model", 1)
        self.n_pipe = mesh.shape.get("pipe", 1)
        self.n_seq = mesh.shape.get("seq", 1)  # "seq" -> ring-attention SP
        self.pp_microbatches = int(
            (cfg.get("parallelism") or {}).get("microbatches", 0))
        if self.n_pipe > 1 and train_mode:
            self._check_pp_config(cfg)
        if self.n_seq > 1 and train_mode:
            self._check_sp_config(cfg)
        # Multi-host runs (parallel/multihost.py): every process executes
        # the same train loop over the same host data; only process 0
        # writes checkpoints / logs. True in single-process runs.
        self.primary = multihost.is_primary()
        self.rng = jax.random.PRNGKey(cfg.get("seed", 88))
        # separate hardware-RNG stream for per-step dropout (train/rng.py);
        # init keeps the threefry stream above so initial params are
        # independent of this choice
        self.dropout_rng = rng_util.dropout_key(cfg.get("seed", 88))
        random.seed(cfg.get("seed", 88))
        np.random.seed(cfg.get("seed", 88))

        # splitext, not a fixed [:-3]/-4 slice: users may pass .pt or .npz
        self.model_prefix = (os.path.splitext(model_file)[0] if model_file
                             else get_model_prefix(cfg))
        self.model_path = (model_file if model_file else os.path.join(
            model_root, self.model_prefix + ".npz"))

        data_name = cfg["dataset"]
        # transfer evaluation swaps the dataset when not training (main.py:67-69)
        if "transfer_dataset" in cfg and not train_mode:
            data_name = cfg["transfer_dataset"]
        self.data_name = data_name

        folder = cfg["datafolder"]
        (self.dataset_train, self.dataset_validate,
         self.dataset_test) = load_filtered_triple(cfg, folder, data_name)

        self.label2ans, self.ans2label = create_ans2label(
            self.dataset_train, self.dataset_validate, self.dataset_test)
        for ds in (self.dataset_train, self.dataset_validate,
                   self.dataset_test):
            ds.add_labels(self.ans2label)

        # -- tokenizers ------------------------------------------------------
        spiece = cfg.get("spiece_model")
        if spiece and os.path.exists(spiece):
            self.tokenizer = T5SentencePieceTokenizer.from_spiece_model(spiece)
        else:
            if self.data_name != cfg["dataset"]:
                # transfer evaluation: the tokenizer must be the one the
                # checkpoint was TRAINED with (the reference's is a fixed
                # asset, dataset-independent — T5VisionModel.py:57), so
                # rebuild the SOURCE dataset's corpus, not the transfer
                # dataset's: embedding rows are tied to those token ids.
                state = random.getstate()  # get_stratified_split reseeds
                try:
                    corpus = tokenizer_corpus(*load_filtered_triple(
                        cfg, folder, cfg["dataset"]))
                finally:
                    random.setstate(state)
            else:
                corpus = tokenizer_corpus(self.dataset_train,
                                          self.dataset_validate,
                                          self.dataset_test)
            self.tokenizer = T5SentencePieceTokenizer.from_corpus(corpus)
        # the reference adds one "[itk]" token (T5VisionModel.py:58-61)
        self.tokenizer.add_tokens(["[itk]"])

        # -- model configs ----------------------------------------------------
        t5_cfg = T5Config.from_version(cfg.get("T5_version", "t5-small"))
        t5_cfg = self._override_t5(t5_cfg, cfg)
        clip_cfg = self._clip_config(cfg)
        if len(self.tokenizer) > t5_cfg.vocab_size:
            # JAX gathers clamp out-of-range ids under jit, so an
            # oversized tokenizer would silently train on the wrong
            # embedding rows — fail loudly instead
            raise ValueError(
                f"tokenizer has {len(self.tokenizer)} ids but the T5 "
                f"embedding has only {t5_cfg.vocab_size} rows; raise "
                "t5_overrides.vocab_size (or shrink the tokenizer corpus)")

        merges = cfg.get("clip_bpe")
        if merges and os.path.exists(merges):
            self.clip_tokenizer = CLIPBPETokenizer.from_merges_file(
                merges, context_length=clip_cfg.context_length)
        else:
            self.clip_tokenizer = CLIPBPETokenizer.build_toy(
                context_length=clip_cfg.context_length)
        num_classes = (cfg["max_answers"]
                       if cfg.get("max_answers") and not cfg.get("use_BAN")
                       else len(self.ans2label))
        rn_cfg = None
        if "RN" in cfg.get("vision_encoder", ""):
            from multimodalpromptretrieval_tpu.models.resnet import (
                ResNetConfig,
            )

            base_rn = (ResNetConfig.rn50x4() if "x4" in cfg["vision_encoder"]
                       else ResNetConfig.rn50())
            import dataclasses as _dc

            # images are preprocessed once at the dataset CLIP's resolution
            # (quirk #2: the cache is built by the stock ViT-B/32 transform)
            # — the fully-convolutional RN consumes them at that size
            base_rn = _dc.replace(base_rn,
                                  image_resolution=clip_cfg.image_resolution)
            o = cfg.get("resnet_overrides")
            if o:
                base_rn = _dc.replace(base_rn, **{
                    k: tuple(v) if k == "layers" else v
                    for k, v in o.items()})
            rn_cfg = base_rn
        self.model_cfg = mprgen.MPRGenConfig(
            t5=t5_cfg, clip=clip_cfg, resnet=rn_cfg,
            use_image_info=bool(cfg["use_image_info"]),
            use_prediction_head=bool(cfg.get("use_prediction_head")),
            use_ban=bool(cfg.get("use_BAN")),
            freeze=bool(cfg.get("freeze")),
            num_classes=num_classes,
            max_source_length=cfg.get("max_source_length", 512),
            max_target_length=cfg.get("max_target_length", 128),
            use_mapping=bool(cfg.get("mapping_checkpoint")),
            compute_dtype=cfg.get("compute_dtype", "float32"),
        )

        self.rng, init_key = jax.random.split(self.rng)
        self.params = mprgen.init_mprgen(init_key, self.model_cfg)
        self._load_pretrained(cfg)
        self.trainable = mprgen.trainable_mask(self.params, self.model_cfg)
        # AdamW moments only exist for training runs: the fp32 mu/nu pair
        # costs 2x the param bytes (t5-large: ~7 GB HBM) and nothing in
        # the eval/serve path reads it (train()/resume allocate-on-use).
        # `adamw_moments_dtype` ("bfloat16") opts into half-footprint
        # moment storage (fp32 math inside the update — train/optim.py)
        self._moments_dtype = cfg.get("adamw_moments_dtype")
        self.opt_state = (adamw_init(self.params,
                                     moments_dtype=self._moments_dtype)
                          if train_mode else None)

        # -- image caches ------------------------------------------------------
        self.image_size = clip_cfg.image_resolution
        self.images = self._build_image_cache()

        # -- retrieval ---------------------------------------------------------
        self.batch_size = cfg["hyperparameters"]["batch_size"]
        self.k = cfg.get("k", 15)
        self.use_quantifier = not ("quantifier" in cfg
                                   and not cfg["quantifier"])
        self.retrieval_index: Optional[RetrievalIndex] = None
        self.retrieval_dataset: Optional[VQADataset] = None
        self._hints: Dict[str, Dict[str, str]] = {}
        self._embed_fn = None  # cached jitted CLIP query embedder
        # (id(dataset), id(params)) -> (n_entries, embeddings)
        self._qemb_cache: Dict[tuple, tuple] = {}
        self._prefix_step_fn = None
        if cfg.get("retrieval"):
            self._setup_retrieval(train_mode)

        # -- jitted steps ------------------------------------------------------
        self._train_step = None
        self._eval_step = None
        self._predict_step = None
        self._gather_step = None
        self._tp_sharding = None
        self._token_cache: Dict[str, Dict[tuple, List[int]]] = {}
        # frozen-trunk vision-token cache: (device table (U, P, C),
        # image_name -> row). Built by build_vision_token_cache.
        self._vision_tokens = None
        # device-resident visual-prefix table for eval (stage_image_prefixes)
        self._prefix_dev = None

    # ------------------------------------------------------------------------

    @staticmethod
    def _build_mesh(cfg):
        """Build the device mesh from the ``parallelism`` config key
        (SURVEY.md §2c: the mesh is the first-class strategy, so it must be
        reachable from the user-facing config, not just the library).

        Schema: ``"parallelism": {"model": N, "pipe": N, "seq": N,
        "data": N, "microbatches": M}`` — all optional. "model" > 1 runs
        Megatron TP over the T5 kernels (parallel/mesh.param_shardings);
        "pipe" > 1 runs GPipe PP over the layer stacks
        (parallel/pipeline); "seq" > 1 runs ring-attention sequence
        parallelism over the T5 encoder (parallel/sequence). "model"
        COMPOSES with "pipe" (VERDICT r4 weak #5): a ("data", "pipe",
        "model") mesh runs Megatron TP inside each GPipe stage
        (parallel/pipeline TP×PP; DP-trajectory-exact at dropout 0,
        tests/test_parallelism_config.py). "seq" still composes only
        with data: the ring encoder's chunk-local attention and the TP
        head split shard the same einsums two different ways, and at T5
        depth the combination has no payoff regime to justify the
        bespoke kernel (PARITY.md variant-coverage table). The data
        axis defaults to the remaining devices, shrunk until it divides
        the static batch size."""
        par = dict(cfg.get("parallelism") or {})
        n_model = int(par.get("model", 1))
        n_pipe = int(par.get("pipe", 1))
        n_seq = int(par.get("seq", 1))
        if n_seq > 1 and (n_model > 1 or n_pipe > 1):
            raise ValueError(
                "parallelism: 'seq' composes only with 'data' — combined "
                "seq+model/pipe meshes are not supported (model+pipe IS: "
                "set both 'model' and 'pipe' above 1 for TP x PP)")
        n_dev = len(jax.devices())
        width = n_model * n_pipe * n_seq
        if n_dev % width:
            raise ValueError(
                f"parallelism: model*pipe*seq = {width} does not divide "
                f"the {n_dev} available devices")
        bs = cfg["hyperparameters"]["batch_size"]
        explicit = int(par.get("data", 0))
        if explicit and bs % explicit:
            # an explicit request is honored or refused, never silently
            # shrunk (the auto-sized axis below may shrink: it is a
            # default, not a request)
            raise ValueError(
                f"parallelism: data={explicit} does not divide "
                f"batch_size={bs}")
        n = explicit or n_dev // width
        while n > 1 and bs % n:
            n -= 1
        if n * width > n_dev:
            raise ValueError(
                f"parallelism: data={n} * model*pipe*seq={width} exceeds "
                f"the {n_dev} available devices")
        if n_pipe > 1:
            return ppipe.get_pipe_mesh(n_data=n, n_pipe=n_pipe,
                                       n_model=n_model)
        if n_seq > 1:
            return pseq.get_seq_mesh(n_data=n, n_seq=n_seq)
        return pmesh.get_mesh(n_data=n, n_model=n_model)

    def _check_pp_config(self, cfg) -> None:
        """Pipeline parallelism covers the generative loss only
        (parallel/pipeline.pp_generative_loss) — refuse configs that
        would silently change semantics rather than approximating them.
        Dropout is supported (r4): the default recipe (dropout 0.1,
        config/experiment.json) pipelines; masks use the PP key schedule
        (pp_generative_loss docstring)."""
        problems = []
        if cfg.get("use_prediction_head") or cfg.get("use_BAN"):
            problems.append(
                "prediction-head / BAN variants are not pipelined")
        if cfg.get("exact_train_predict"):
            problems.append(
                "exact_train_predict greedy-decodes on every train batch, "
                "which is not pipelined")
        if problems:
            raise ValueError(
                "parallelism.pipe > 1 is incompatible with this config: "
                + "; ".join(problems))

    def _check_sp_config(self, cfg) -> None:
        """Sequence parallelism covers the generative loss (the ring
        encoder + replicated decoder, parallel/sequence.
        sp_generative_loss) — refuse variants whose losses aren't SP'd
        rather than silently falling back. Dropout is supported (every
        T5 dropout site is chunk-local; see the sp_generative_loss key
        schedule)."""
        if cfg.get("use_prediction_head") or cfg.get("use_BAN"):
            raise ValueError(
                "parallelism.seq > 1 is incompatible with this config: "
                "prediction-head / BAN variants are not "
                "sequence-parallelized")

    @staticmethod
    def _override_t5(t5_cfg: T5Config, cfg) -> T5Config:
        """`t5_overrides` lets tests/synthetic runs shrink the model."""
        o = cfg.get("t5_overrides")
        if not o:
            return t5_cfg
        import dataclasses

        return dataclasses.replace(t5_cfg, **o)

    @staticmethod
    def _clip_config(cfg) -> CLIPConfig:
        o = cfg.get("clip_overrides")
        base = CLIPConfig.vit_b32()
        if not o:
            return base
        import dataclasses

        return dataclasses.replace(base, **o)

    def _load_pretrained(self, cfg) -> None:
        """Optional converted-weights hooks: paths to torch checkpoints.

        ``t5_checkpoint`` — HF T5 state_dict (.pt / .bin);
        ``vision_checkpoint`` — PubMedCLIP {'state_dict': ...} layout
        (T5VisionModel.py:39-42); ``clip_checkpoint`` — OpenAI CLIP.
        """
        from multimodalpromptretrieval_tpu.models import convert

        def load_torch(path):
            import torch

            obj = torch.load(path, map_location="cpu", weights_only=False)
            if isinstance(obj, dict) and "model_state_dict" in obj:
                obj = obj["model_state_dict"]  # reference main.py:199-206
            elif isinstance(obj, dict) and "state_dict" in obj:
                obj = obj["state_dict"]  # PubMedCLIP layout
            return convert.state_dict_to_numpy(obj)

        if cfg.get("reference_checkpoint") and os.path.exists(
                cfg["reference_checkpoint"]):
            # migrate a trained reference model (torch.save of the full
            # T5VisionModel* state_dict) into this framework wholesale
            sd = load_torch(cfg["reference_checkpoint"])
            converted = convert.mprgen_from_reference_checkpoint(
                sd, self.model_cfg)
            self.params.update(converted)
            return
        if cfg.get("mapping_checkpoint") and os.path.exists(
                cfg["mapping_checkpoint"]):
            # reference hook (T5VisionModel.py:32-37); inert in its main
            # path (main.py always passes None) but honored when configured
            from multimodalpromptretrieval_tpu.train.checkpoint import (
                load_checkpoint,
            )

            if "mapping" in self.params:
                self.params["mapping"], _, _ = load_checkpoint(
                    cfg["mapping_checkpoint"], self.params["mapping"])
        if cfg.get("t5_checkpoint") and os.path.exists(cfg["t5_checkpoint"]):
            sd = load_torch(cfg["t5_checkpoint"])
            self.params["t5"] = convert.t5_from_hf(sd, self.model_cfg.t5)
            self.params["t5"] = convert.resize_token_embeddings(
                self.params["t5"], len(self.tokenizer))
        path = cfg.get("vision_checkpoint") or cfg.get("clip_checkpoint")
        if path and os.path.exists(path):
            sd = load_torch(path)
            sd = {k[len("visual_encoder."):] if k.startswith("visual_encoder.")
                  else k: v for k, v in sd.items()}
            if "visual.layer1.0.conv1.weight" in sd:  # ModifiedResNet tower
                from multimodalpromptretrieval_tpu.models import resnet as rn

                self.params["clip_rn"] = rn.resnet_from_openai(
                    sd, self.model_cfg.resnet)
            else:
                self.params["clip"] = convert.clip_from_openai(
                    sd, self.model_cfg.clip)

    def _build_image_cache(self) -> ImageCache:
        cache = ImageCache({})
        for ds, split in ((self.dataset_train, "train"),
                          (self.dataset_validate, "validate"),
                          (self.dataset_test, "test")):
            roots: Dict[str, List[dict]] = {}
            for e in ds.entries:
                roots.setdefault(e["dataroot"], []).append(e)
            for root, entries in roots.items():
                cache.update(ImageCache.build(root, entries, split,
                                              size=self.image_size))
        return cache

    # -- retrieval -------------------------------------------------------------

    def _clip_embed_fn(self):
        # one jitted closure per Experiment — a fresh @jax.jit per call
        # would retrace/recompile on every use
        if self._embed_fn is not None:
            return self._embed_fn
        cfg = self.model_cfg.clip
        from multimodalpromptretrieval_tpu.models.clip import (
            truncate_text_ids,
        )

        @jax.jit
        def embed(params, images, text_ids):
            img = clip_encode_image(params, cfg, images)
            txt = clip_encode_text(params, cfg, text_ids)
            return jnp.concatenate([img, txt], axis=1)

        def run(images, text_ids, params=None):
            # bucketed truncation: bit-identical CLIP text embeddings at a
            # fraction of the padded-77 cost (models/clip.truncate_text_ids).
            # ``params`` overrides the CLIP subtree (MPRServer passes its
            # quantized copy under quantize="int8_all").
            ids = truncate_text_ids(text_ids)
            return embed(self.params["clip"] if params is None else params,
                         jnp.asarray(images), jnp.asarray(ids))

        self._embed_fn = run
        return run

    def _setup_retrieval(self, train_mode: bool) -> None:
        cfg = self.cfg
        if "retrieval_dataset" in cfg:
            rds = load_dataset(cfg["datafolder"], cfg["retrieval_dataset"],
                               "train")
        else:
            # reference-exact (main.py:107-110): without a separate
            # retrieval_dataset, retrieval_subset mutates THE SHARED
            # dataset_train object — the training split shrinks too.
            # Deliberate quirk parity, not an accident.
            rds = self.dataset_train
        if "retrieval_subset" in cfg:
            split = rds.get_stratified_split(
                split_fraction=cfg["retrieval_subset"])
            rds.entries = [rds.entries[x] for x in split]
        self.retrieval_dataset = rds

        # image cache for the retrieval corpus (may be a different dataset)
        roots: Dict[str, List[dict]] = {}
        for e in rds.entries:
            roots.setdefault(e["dataroot"], []).append(e)
        rcache = ImageCache({})
        for root, entries in roots.items():
            rcache.update(ImageCache.build(root, entries, "train",
                                           size=self.image_size))
        embed = self._clip_embed_fn()
        cache_dir = self.cfg.get("retrieval_cache_dir", "cache")
        if self.cfg.get("retrieval_cache_compat"):
            # the reference keys its cache by class name ONLY
            # (dataset/VQAFeatureDataset.py:122-124, quirk #4) — stale
            # across subsets/encoders/seeds; opt-in for byte-compat runs
            key = type(rds).__name__
        else:
            # content key: corpus identity + everything the embeddings
            # depend on (CLIP init seed / checkpoint / overrides), so a
            # changed subset or encoder can never serve a stale index
            src = json.dumps({
                "class": type(rds).__name__,
                "qids": [str(e["question_id"]) for e in rds.entries],
                "images": [e["image_name"] for e in rds.entries],
                "seed": self.cfg.get("seed", 88),
                "vision_encoder": self.cfg.get("vision_encoder"),
                "vision_checkpoint": self.cfg.get("vision_checkpoint"),
                "clip_overrides": self.cfg.get("clip_overrides"),
                "image_size": self.image_size,
            }, sort_keys=True)
            key = (f"{type(rds).__name__}-"
                   f"{zlib.crc32(src.encode()):08x}")
        cache_path = os.path.join(cache_dir, key, "index.npz")
        self.retrieval_index = RetrievalIndex.build(
            embed,
            rds.entries,
            lambda names: rcache.batch(names),
            lambda qs: self.clip_tokenizer.tokenize(qs),
            batch_size=self.batch_size,
            is_training_phase=train_mode,
            retrieval_k=self.k,
            cache_path=cache_path if self.cfg.get("cache_retrieval", True)
            else None,
        )
        if cfg.get("use_additional_retrieval_data"):
            extra = self.cfg.get(
                "additional_retrieval_cache",
                os.path.join("synthetic_data", "cache",
                             "ROCOFeatureDataset", "index.npz"))
            if os.path.exists(extra):
                self.retrieval_index.extend(RetrievalIndex.load(extra))

    def _query_embeddings(self, dataset: VQADataset) -> np.ndarray:
        """CLIP image⊕text embeddings for every entry of a split, batched.

        Memoized per (dataset, params) object pair: ``test()`` needs the
        same embeddings ``precompute_hints`` just computed — without the
        cache that is a duplicate full CLIP pass over the split."""
        key = (id(dataset), id(self.params))
        hit = self._qemb_cache.get(key)
        if hit is not None and hit[0] == len(dataset.entries):
            return hit[1]
        embed = self._clip_embed_fn()
        entries = dataset.entries
        # batched host tokenize once (native encode path), then the shared
        # chunk loop pairs each entry's image with its token row
        ids_all = self.clip_tokenizer.tokenize(
            [e["question"] for e in entries])
        out = encode_unique_chunks(
            list(range(len(entries))),
            lambda i: (self.images[entries[i]["image_name"]], ids_all[i]),
            lambda x: x, lambda x: embed(*x), self.batch_size)
        result = np.asarray(out[0])
        self._qemb_cache[key] = (len(entries), result)
        return result

    def precompute_hints(self, dataset: VQADataset, split_name: str) -> None:
        """Retrieval prompt strings per entry (CLIP + corpus are frozen, so
        this is loop-invariant — the TPU-first hoist of main.py:178-179)."""
        if self.retrieval_index is None:
            return
        q = self._query_embeddings(dataset)
        prompts = self.retrieval_index.retrieve(
            jnp.asarray(q), use_quantifier=self.use_quantifier, k=self.k)
        table = self._hints.setdefault(split_name, {})
        for e, p in zip(dataset.entries, prompts):
            table[e["question_id"]] = p
        # hints changed -> cached token ids for this split are stale
        self._token_cache.pop(split_name, None)

    def hint_for(self, entry: dict, split_name: str) -> str:
        if self.retrieval_index is None:
            return ""
        if self.model_cfg.use_ban:
            # the reference BAN variant's prepare_input builds
            # `task_prefix + question` only — it never calls the
            # retrieval function for the prompt (quirk #9;
            # T5VisionModelPredictionHeadBAN.py:116-139), even when the
            # experiment has retrieval on for its diagnostics
            return ""
        return self._hints.get(split_name, {}).get(entry["question_id"], "")

    # -- batching --------------------------------------------------------------

    def encode_entry(self, entry: dict, split_name: str) -> List[int]:
        """Task prefix + question + retrieved hint, tokenized
        (T5VisionModel.py:153-167; hint appended with no separator —
        quirk #12). Prompts are epoch-invariant (frozen CLIP + corpus), so
        token ids are cached across epochs — unlike the reference, which
        re-tokenizes inside the hot loop every batch.

        Cache key is (question_id, task), not qid alone: VQA-RAD fans one
        record out into several entries sharing a qid but with different
        tasks (data/datasets.py VQA_RAD qtype_map, reference
        VQA_RAD.py:35-50), and the task is part of the prompt prefix."""
        cache = self._token_cache.setdefault(split_name, {})
        key = (entry["question_id"], entry["task"])
        ids = cache.get(key)
        if ids is None:
            text = (f"Answer the {entry['task']} question: "
                    + entry["question"] + self.hint_for(entry, split_name))
            ids = self.tokenizer.encode(
                text, max_length=self.model_cfg.max_source_length)
            cache[key] = ids
        return ids

    def _image_prefix_step(self):
        # cached like predict_step: a fresh pmesh.make_image_prefix_step
        # per call would retrace/recompile on every use
        if self._prefix_step_fn is None:
            self._prefix_step_fn = pmesh.make_image_prefix_step(
                self.model_cfg, mesh=self.mesh,
                param_sharding=self.param_sharding())
        return self._prefix_step_fn

    def compute_image_prefixes(self, entries) -> Dict[str, np.ndarray]:
        """Visual prefix per unique image (frozen tower ⇒ loop-invariant;
        SLAKE averages ~3 questions per image, so eval recomputes ~1/3 of
        the ViT work the reference does)."""
        seen = set()
        names = [e["image_name"] for e in entries
                 if not (e["image_name"] in seen or seen.add(e["image_name"]))]
        step = self._image_prefix_step()
        out = encode_unique_chunks(
            names, lambda n: self.images[n],
            lambda x: self.device_batch_from({"x": x})["x"],
            lambda x: step(self.params, x), self.batch_size)
        if out is None:
            return {}
        arr = np.asarray(out[0])
        return {n: arr[j] for j, n in enumerate(names)}

    def build_vision_token_cache(self, *entry_lists) -> bool:
        """Precompute the FROZEN vision trunk once per unique image.

        The tower is always frozen (T5VisionModel.py:29-30), so its
        per-token output (mprgen.vision_trunk: all ViT tokens / RN grid) is
        loop-invariant across steps and epochs. Caching it device-side
        removes the tower forward from every train step (~30% of the step
        at B=128, docs/TPU_NOTES.md) AND replaces the per-batch raw-image
        upload (B·3·R² floats) with a (B, P, C) device-side gather. The
        trainable tail (mapping MLP / projection) still runs in-step, so
        gradients are unchanged — the cached trunk was stop_gradient'd
        anyway.

        Returns False (and leaves the image path in place) when the
        variant takes no images, ``cache_vision_tokens`` is 0 in the
        config, or the table would exceed ``vision_cache_max_bytes``
        (default 4 GiB)."""
        mcfg = self.model_cfg
        if not (mcfg.use_image_info or mcfg.use_ban):
            return False
        if not self.cfg.get("cache_vision_tokens", True):
            return False
        seen: set = set()
        names: List[str] = []
        for entries in entry_lists:
            for e in entries:
                n = e["image_name"]
                if n not in seen:
                    seen.add(n)
                    names.append(n)
        if not names:
            return False
        step = pmesh.make_vision_tokens_step(
            mcfg, mesh=self.mesh, param_sharding=self.param_sharding())
        # upload in the compute dtype (the step casts on device anyway;
        # half the wire bytes under bf16 — same rule as serve staging)
        np_dt = np.dtype(mcfg.compute_dtype)
        cap = int(self.cfg.get("vision_cache_max_bytes", 4 << 30))
        out = encode_unique_chunks(
            names, lambda n: self.images[n].astype(np_dt),
            lambda x: self.device_batch_from({"x": x})["x"],
            lambda x: step(self.params, x), self.batch_size,
            first_chunk_guard=lambda rows:
                len(names) * rows[0].nbytes > cap)
        if out is None:
            return False
        self._vision_tokens = (out[0],
                               {n: i for i, n in enumerate(names)})
        return True

    def stage_image_prefixes(self, entries) -> None:
        """Device-resident visual-prefix table over the unique images of
        ``entries`` (serve-style staging): ONE vision pass per unique
        image, kept on device; eval batches gather their rows device-side
        (``prefix_rows`` in make_split_batches), so prefixes never cross
        the host wire — unlike :meth:`compute_image_prefixes`, which
        returns host arrays that each batch re-uploads."""
        seen: set = set()
        names = [e["image_name"] for e in entries
                 if not (e["image_name"] in seen or seen.add(e["image_name"]))]
        step = self._image_prefix_step()
        np_dt = np.dtype(self.model_cfg.compute_dtype)
        out = encode_unique_chunks(
            names, lambda n: self.images[n].astype(np_dt),
            lambda x: self.device_batch_from({"x": x})["x"],
            lambda x: step(self.params, x), self.batch_size)
        self._prefix_dev = (out[0] if out else None,
                            {n: i for i, n in enumerate(names)})

    def make_split_batches(self, dataset: VQADataset, split_name: str,
                           shuffle: bool = False,
                           prefix_table: Optional[Dict[str, np.ndarray]]
                           = None, prefix_rows: bool = False,
                           epoch: int = 0) -> List[Batch]:
        needs_labels = not self.model_cfg.use_prediction_head
        # zlib.crc32, not hash(): Python string hashing is salted per
        # process (PYTHONHASHSEED), which would make batch order — and the
        # trained weights — differ between runs of the same config.
        # ``epoch`` folds in so each epoch draws a FRESH permutation (the
        # reference DataLoader(shuffle=True) reshuffles per epoch) while
        # staying process-stable.
        seed = zlib.crc32(
            f"{split_name}:{int(self.cfg.get('seed', 88))}:{epoch}"
            .encode())
        rng = np.random.default_rng(seed) if shuffle else None
        needs_image = (self.model_cfg.use_image_info
                       or self.model_cfg.use_ban)
        vt = self._vision_tokens
        use_vt = (prefix_table is None and needs_image and vt is not None
                  and all(e["image_name"] in vt[1]
                          for e in dataset.entries))
        array_fns = None
        if prefix_rows:
            pd = self._prefix_dev[1]
            array_fns = {"prefix_rows": lambda es: np.asarray(
                [pd[e["image_name"]] for e in es], np.int32)}
        elif prefix_table is not None:
            array_fns = {"prefix": lambda es: np.stack(
                [prefix_table[e["image_name"]] for e in es])}
        elif use_vt:
            # rows into the device-resident frozen-trunk table; resolved
            # to vision_tokens by device_batch (a device-side gather — no
            # raw images cross the wire)
            array_fns = {"vision_rows": lambda es: np.asarray(
                [vt[1][e["image_name"]] for e in es], np.int32)}
        return make_batches(
            dataset.entries, self.batch_size,
            encode_fn=lambda e: self.encode_entry(e, split_name),
            array_fns=array_fns,
            image_fn=(lambda es: np.stack(
                [self.images[e["image_name"]] for e in es]))
            if (prefix_table is None and not prefix_rows and not use_vt
                and needs_image)
            else None,
            target_fn=(lambda e: self.tokenizer.encode(
                e["answer"], max_length=self.model_cfg.max_target_length))
            if needs_labels else None,
            label_fn=(lambda e: e["label"])
            if self.model_cfg.use_prediction_head else None,
            shuffle_rng=rng,
            max_source_length=self.model_cfg.max_source_length,
        )

    def device_batch(self, batch: Batch) -> Dict[str, jnp.ndarray]:
        gathers = (("vision_rows", "vision_tokens", self._vision_tokens),
                   ("prefix_rows", "prefix", self._prefix_dev))
        if not any(batch.arrays.get(k) is not None for k, _, _ in gathers):
            return pmesh.shard_batch(batch.arrays, self.mesh)
        drop = {k for k, _, _ in gathers}
        out = pmesh.shard_batch(
            {k: v for k, v in batch.arrays.items() if k not in drop},
            self.mesh)
        for key, name, table in gathers:
            rows = batch.arrays.get(key)
            if rows is None:
                continue
            # device-side gather from the replicated table, placed onto the
            # data axis explicitly (jit with in_shardings rejects mismatched
            # committed args rather than resharding them)
            if multihost.spans_processes(self.mesh):
                # cross-process mesh: the gather must be a global SPMD
                # program (eager take + device_put only address local
                # shards); the table is replicated, rows identical per
                # process, output lands sharded on "data"
                out[name] = self._global_gather()(
                    table[0], jnp.asarray(rows))
            else:
                out[name] = jax.device_put(
                    jnp.take(table[0], jnp.asarray(rows), axis=0),
                    pmesh.batch_sharding(self.mesh))
        return out

    def _global_gather(self):
        if self._gather_step is None:
            self._gather_step = jax.jit(
                lambda t, r: jnp.take(t, r, axis=0),
                out_shardings=pmesh.batch_sharding(self.mesh))
        return self._gather_step

    def fetch(self, x) -> np.ndarray:
        """Device->host fetch; on a multi-host mesh this all-gathers the
        cross-process shards first (multihost.fetch)."""
        return multihost.fetch(x, self.mesh)

    def device_batch_from(self, arrays: Dict[str, Any]) -> Dict[str, Any]:
        return pmesh.shard_batch(arrays, self.mesh)

    # -- steps -----------------------------------------------------------------

    def param_sharding(self):
        """NamedSharding pytree for params under the configured axes:
        TP-sharded T5 kernels when n_model > 1, else None (replicated).
        Passed to every param-consuming jit so committed placements stay
        consistent across the train / eval / predict / vision steps."""
        if self.n_model <= 1:
            return None
        if self._tp_sharding is None:
            self._tp_sharding = pmesh.param_shardings(self.params, self.mesh)
        return self._tp_sharding

    def train_step(self):
        if self._train_step is None:
            if self.n_pipe > 1:
                specs = ppipe.param_pipe_specs(self.params,
                                               n_model=self.n_model)
                # same (params, opt, batch, lr, rng) signature as the
                # DP/TP step; rng drives the PP dropout key schedule.
                # n_model > 1 here is the TP x PP composition: Megatron
                # TP inside each GPipe stage (parallel/pipeline)
                self._train_step = ppipe.make_train_step_pp(
                    self.model_cfg, self.trainable, mesh=self.mesh,
                    param_specs=specs,
                    microbatches=self.pp_microbatches)
            elif self.n_seq > 1:
                # ring-attention SP over the encoder (parallel/sequence);
                # params replicated, batch sharded on "data"
                self._train_step = pseq.make_train_step_sp(
                    self.model_cfg, self.trainable, mesh=self.mesh)
            else:
                self._train_step = pmesh.make_train_step(
                    self.model_cfg, self.trainable, mesh=self.mesh,
                    param_sharding=self.param_sharding())
        return self._train_step

    def eval_step(self):
        if self._eval_step is None:
            if self.n_pipe > 1:
                self._eval_step = ppipe.make_eval_loss_step_pp(
                    self.model_cfg, mesh=self.mesh,
                    param_specs=ppipe.param_pipe_specs(
                        self.params, n_model=self.n_model),
                    microbatches=self.pp_microbatches)
            elif self.n_seq > 1:
                self._eval_step = pseq.make_eval_loss_step_sp(
                    self.model_cfg, mesh=self.mesh)
            else:
                self._eval_step = pmesh.make_eval_loss_step(
                    self.model_cfg, mesh=self.mesh,
                    param_sharding=self.param_sharding())
        return self._eval_step

    def predict_step(self):
        if self._predict_step is None:
            self._predict_step = pmesh.make_predict_step(
                self.model_cfg, mesh=self.mesh,
                param_sharding=self.param_sharding())
        return self._predict_step

    # -- phases ----------------------------------------------------------------

    def validation_loss(self, batches: List[Batch]) -> float:
        """utils.get_validation_loss parity: mean of per-batch means weighted
        by true batch sizes (utils.py:78-87)."""
        step = self.eval_step()
        total, n = 0.0, 0
        for b in batches:
            loss = float(step(self.params, self.device_batch(b)))
            total += loss * len(b)
            n += len(b)
        return total / max(n, 1)

    def log(self, msg: str) -> None:
        if not self.quiet:
            print(msg)

    def train(self, resume: bool = False) -> Dict[str, Any]:
        cfg = self.cfg
        hp = cfg["hyperparameters"]
        if self.opt_state is None:  # experiment built with train_mode=False
            self.opt_state = adamw_init(self.params,
                                        moments_dtype=self._moments_dtype)
        resume_meta: Dict[str, Any] = {}
        if resume:
            if not os.path.exists(self.model_path):
                raise FileNotFoundError(
                    f"--resume: no checkpoint at {self.model_path}")
            self.params, opt, resume_meta = ckpt.load_checkpoint(
                self.model_path, self.params, self.opt_state)
            if opt is not None:
                self.opt_state = opt
            if cfg.get("further_finetune"):
                # reference: new save path + LR reset (main.py:155-160)
                self.model_path = os.path.join(
                    self.model_root,
                    self.model_prefix + "_msrc_with_retrieval_80.npz")
        scheduler = ReduceLROnPlateau(lr=hp["learning_rate"])
        if resume and not cfg.get("further_finetune"):
            # reference parity: optimizer.load_state_dict restores the
            # param_groups LR, so a resumed run continues at the decayed LR
            # (a fresh torch scheduler keeps stepping it from there);
            # further_finetune resets g['lr'] to the config value
            # (main.py:154-160). Patience counters are fresh either way.
            scheduler.lr = float(resume_meta.get("lr", scheduler.lr))
        self.scheduler = scheduler  # introspectable (tests, notebooks)
        if self.retrieval_index is not None:
            self.retrieval_index.is_training_phase = True
            self.precompute_hints(self.dataset_train, "train")
            self.precompute_hints(self.dataset_validate, "validate")

        # frozen vision tower ⇒ its trunk output is loop-invariant:
        # compute it once per unique image (train ∪ validate) and train
        # from the cached tokens (build_vision_token_cache docstring)
        self.build_vision_token_cache(self.dataset_train.entries,
                                      self.dataset_validate.entries)
        step = self.train_step()
        val_batches = self.make_split_batches(self.dataset_validate,
                                              "validate")
        # reference-exact (main.py:161): best_valid resets to inf even on
        # --resume, so the first resumed epoch always re-saves the
        # checkpoint (possibly over a better one). Deliberate quirk
        # parity; resume_meta["valid_loss"] is persisted if a caller
        # wants the stricter behavior.
        best_valid = float("inf")
        best_epoch = 0
        streak = 0
        parameter_updates = 0
        train_losses: List = []
        valid_losses: List = []
        train_info_path = os.path.join(self.log_root, self.model_prefix)
        os.makedirs(train_info_path, exist_ok=True)

        for epoch in range(hp["epochs"]):
            self.log(f"Starting epoch {epoch} ...")
            self.log(f"The learning rate is now {scheduler.lr}")
            batches = self.make_split_batches(self.dataset_train, "train",
                                              shuffle=True, epoch=epoch)
            t0 = time.time()
            # quirk #5: the reference greedy-generates on EVERY training
            # batch and uses the result only for pred-head train accuracy
            # (main.py:179-183). Gate on use_prediction_head; the config
            # key exact_train_predict restores the full behavior.
            track_train_acc = (self.model_cfg.use_prediction_head
                               or cfg.get("exact_train_predict"))
            total_ans = 0
            correct_ans = 0
            epoch_losses = []
            # prefetch: ship batch i+1 to the device while step i runs —
            # jax dispatch is async, so the transfer overlaps compute
            device_batches = [None, None]
            if batches:
                device_batches[0] = self.device_batch(batches[0])
            for i, b in enumerate(batches):
                db = device_batches[i % 2]
                if i + 1 < len(batches):
                    device_batches[(i + 1) % 2] = self.device_batch(
                        batches[i + 1])
                self.dropout_rng, key = jax.random.split(self.dropout_rng)
                if track_train_acc:
                    preds = self.fetch(self.predict_step()(self.params, db))
                    if self.model_cfg.use_prediction_head:
                        labels = b.arrays["class_labels"]
                        correct_ans += int(
                            ((preds == labels) & b.valid).sum())
                        total_ans += int(b.valid.sum())
                self.params, self.opt_state, loss = step(
                    self.params, self.opt_state, db,
                    jnp.float32(scheduler.lr), key)
                parameter_updates += 1
                # keep the loss on device — a float() here would sync the
                # host every step and stall the pipeline (the reference's
                # loss.item() does exactly that)
                epoch_losses.append((loss, len(b)))
            train_total = float(sum(l * n for l, n in epoch_losses))
            if not np.isfinite(train_total):
                # failure detection (aux subsystem #3 — absent in the
                # reference): a non-finite loss poisons AdamW moments; stop
                # instead of silently training on NaNs. The best checkpoint
                # on disk is the recovery point (--resume).
                raise FloatingPointError(
                    f"non-finite training loss at update "
                    f"{parameter_updates}; resume from {self.model_path}")
            n_train = sum(len(b) for b in batches)
            if self.model_cfg.use_prediction_head and total_ans:
                self.log(f"Train acc is: {correct_ans / total_ans}")
            self.log(f"Train loss is {train_total / max(n_train, 1)} "
                     f"({time.time() - t0:.1f}s)")
            valid_loss = self.validation_loss(val_batches)
            scheduler.step(valid_loss)
            self.log(f"Validation Loss: {valid_loss} | Best Validation "
                     f"Loss: {best_valid} at epoch {best_epoch}")
            if valid_loss < best_valid:
                self.log(f"Saving model to {self.model_path} ...")
                if self.primary:  # multi-host: one writer per shared FS
                    # checkpoint_save_optimizer=0 drops the AdamW moments
                    # from the checkpoint (and skips their device->host
                    # fetch — at t5-large scale ~6 GB per save): serving
                    # never reads them; --resume then restarts with
                    # fresh moments
                    ckpt.save_checkpoint(
                        self.model_path, self.params,
                        self.opt_state if cfg.get(
                            "checkpoint_save_optimizer", True) else None,
                        metadata={"epoch": epoch, "valid_loss": valid_loss,
                                  "lr": scheduler.lr, "config": cfg})
                best_valid = valid_loss
                best_epoch = epoch
                streak = 0
            else:
                streak += 1
            train_losses.append(
                (parameter_updates, train_total / max(n_train, 1)))
            valid_losses.append((parameter_updates, valid_loss))
            if streak > 30:
                self.log(f"Loss didn't improve for {streak - 1} epochs. "
                         "Stopping training ...")
                break

        if self.primary:  # multi-host: one writer per shared FS
            with open(os.path.join(train_info_path, "training_loss.txt"),
                      "w") as f:
                f.write("parameter_updates,loss\n")
                for u, l in train_losses:
                    f.write(f"{u},{l}\n")
            with open(os.path.join(train_info_path, "validation_loss.txt"),
                      "w") as f:
                f.write("parameter_updates,loss\n")
                for u, l in valid_losses:
                    f.write(f"{u},{l}\n")
        return {"best_valid_loss": best_valid, "best_epoch": best_epoch,
                "parameter_updates": parameter_updates}

    def test(self, load: bool = True) -> TestMetrics:
        if load:
            if not os.path.exists(self.model_path):
                # the reference's torch.load would raise here too
                # (main.py:230); silently evaluating random weights is worse
                raise FileNotFoundError(
                    f"no checkpoint at {self.model_path}; train first or "
                    "pass load=False")
            self.params, _, _ = ckpt.load_checkpoint(
                self.model_path, self.params)
        elif self.n_pipe > 1:
            # decode/test run un-pipelined: params straight out of a PP
            # train are layer-sharded over "pipe", which the replicated
            # predict jits would reject — pull a dense host copy once and
            # let the steps re-place it
            self.params = jax.device_get(self.params)
        mcfg = self.model_cfg
        if self.retrieval_index is not None:
            self.retrieval_index.is_training_phase = False
            self.precompute_hints(self.dataset_test, "test")
            test_q = self._query_embeddings(self.dataset_test)
            qpos = {e["question_id"]: i
                    for i, e in enumerate(self.dataset_test.entries)}
        metrics = TestMetrics(retrieval_k=self.k)
        use_prefix_cache = (not mcfg.use_prediction_head
                            and mcfg.use_image_info
                            and self.cfg.get("cache_image_prefix", True))
        if use_prefix_cache:
            # serve-style staging: the prefix table stays ON DEVICE and
            # batches gather their rows there (no per-batch prefix upload)
            self.stage_image_prefixes(self.dataset_test.entries)
            step = pmesh.make_prefix_predict_step(
                mcfg, mesh=self.mesh, param_sharding=self.param_sharding())
            batches = self.make_split_batches(self.dataset_test, "test",
                                              prefix_rows=True)
        else:
            step = self.predict_step()
            batches = self.make_split_batches(self.dataset_test, "test")
        do_retrieval_diag = (self.retrieval_index is not None
                             and not mcfg.use_prediction_head)
        if do_retrieval_diag:
            # ONE top-k over the whole split (queries are already
            # precomputed); answers and types are host gathers from the
            # same index rows — the previous per-batch code re-ran the
            # full distance scan twice per batch
            _, tidx = self.retrieval_index.topk(jnp.asarray(test_q),
                                                k=self.k)
            tidx = np.asarray(tidx)
            r_answers = self.retrieval_index.answers
            r_qtypes = self.retrieval_index.question_info["question_type"]
        # one batch in flight: dispatch i+1 before materializing i (the
        # host-side decode/metrics work overlaps device compute)
        pending = [step(self.params, self.device_batch(b)) for b in
                   batches[:1]]
        for i, b in enumerate(batches):
            if i + 1 < len(batches):
                pending.append(step(self.params,
                                    self.device_batch(batches[i + 1])))
            preds = self.fetch(pending.pop(0))
            for j, entry in enumerate(b.entries):
                if not b.valid[j]:
                    continue
                if mcfg.use_prediction_head:
                    metrics.add_classification(int(preds[j]), entry)
                    continue
                answer = self.tokenizer.decode(preds[j],
                                               skip_special_tokens=True)
                closest = self.dataset_test.get_closest_label(answer.lower())
                metrics.add_generative(answer, entry, closest)
                if do_retrieval_diag:
                    row = tidx[qpos[entry["question_id"]]]
                    metrics.add_retrieval_diagnostics(
                        answer, entry, [r_answers[x] for x in row],
                        [r_qtypes[x] for x in row])
        self.log(metrics.report())
        if self.primary:  # multi-host: one writer per shared FS
            metrics.write_artifacts(self.log_root, self.model_prefix)
        return metrics


def run_from_config(config_path: str, *, train: bool = False,
                    resume: bool = False, test: bool = False,
                    model_file: Optional[str] = None, **kw):
    with open(config_path) as f:
        cfg = json.load(f)
    exp = Experiment(cfg, train_mode=train or resume,
                     model_file=model_file, **kw)
    results = {}
    if train or resume:
        results["train"] = exp.train(resume=resume)
    if test:
        results["test"] = exp.test()
    return exp, results
