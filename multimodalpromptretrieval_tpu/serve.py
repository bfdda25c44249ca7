"""Programmatic serving API: answer (image, question) pairs end-to-end.

The reference only exposes batch evaluation through main.py --test; this
wraps the same pipeline (CLIP prefix -> retrieval hint -> T5 greedy decode)
behind a reusable session so the framework can be embedded:

    exp = Experiment(cfg, train_mode=False, ...)
    server = MPRServer(exp)                  # loads the best checkpoint
    answers = server.answer(images, questions, tasks)

Requests are padded up to the compiled batch size / length buckets, so any
request size reuses the same jitted programs.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import jax.numpy as jnp


class MPRServer:
    def __init__(self, experiment, load_checkpoint: bool = True,
                 max_new_tokens: int = 20):
        import os

        from multimodalpromptretrieval_tpu.train import checkpoint as ckpt

        self.exp = experiment
        self.max_new_tokens = max_new_tokens
        if load_checkpoint and os.path.exists(experiment.model_path):
            experiment.params, _, _ = ckpt.load_checkpoint(
                experiment.model_path, experiment.params)
        if experiment.retrieval_index is not None:
            experiment.retrieval_index.is_training_phase = False
            self._embed = experiment._clip_embed_fn()
        self._predict = experiment.predict_step()
        self._prefix_predict = None
        self._image_prefix_step = None

    def _hints(self, images: np.ndarray, questions: Sequence[str]
               ) -> List[str]:
        exp = self.exp
        if exp.retrieval_index is None:
            return ["" for _ in questions]
        ids = exp.clip_tokenizer.tokenize(list(questions))
        q = self._embed(images, ids)
        return exp.retrieval_index.retrieve(
            jnp.asarray(q), use_quantifier=exp.use_quantifier, k=exp.k)

    def _prefix_table(self, images: np.ndarray,
                      image_ids: Sequence) -> np.ndarray:
        """(N,) per-request visual prefixes computed once per UNIQUE image
        (frozen tower ⇒ requests sharing an image share the ViT work, the
        serve-side analogue of Experiment.compute_image_prefixes)."""
        from multimodalpromptretrieval_tpu.parallel import mesh as pmesh

        exp = self.exp
        if self._image_prefix_step is None:
            self._image_prefix_step = pmesh.make_image_prefix_step(
                exp.model_cfg, mesh=exp.mesh)
        first: dict = {}
        for i, iid in enumerate(image_ids):
            first.setdefault(iid, i)
        uniq = list(first.values())
        B = exp.batch_size
        utab = []
        for s in range(0, len(uniq), B):
            chunk = uniq[s:s + B]
            padded = chunk + [chunk[-1]] * (B - len(chunk))
            imgs = exp.device_batch_from(
                {"x": np.asarray(images[padded], np.float32)})["x"]
            utab.append(np.asarray(
                self._image_prefix_step(exp.params, imgs))[:len(chunk)])
        utab = np.concatenate(utab, axis=0)
        pos = {iid: j for j, iid in enumerate(first)}
        return utab[[pos[iid] for iid in image_ids]]

    def answer(self, images: np.ndarray, questions: Sequence[str],
               tasks: Optional[Sequence[str]] = None,
               image_ids: Optional[Sequence] = None) -> List[str]:
        """images: (N, 3, R, R) preprocessed (ops/image.clip_preprocess);
        returns N answer strings.

        ``image_ids`` (optional): a stable id per row; rows sharing an id
        share one ViT prefix computation. Batches are dispatched with one
        in flight so host decode overlaps device compute.
        """
        from multimodalpromptretrieval_tpu.data.batching import (
            bucket_width,
            pad_ids,
        )
        from multimodalpromptretrieval_tpu.parallel import mesh as pmesh

        exp = self.exp
        n = len(questions)
        tasks = list(tasks) if tasks is not None else ["open"] * n
        B = exp.batch_size
        needs_image = exp.model_cfg.use_image_info or exp.model_cfg.use_ban
        use_prefix = (image_ids is not None and needs_image
                      and not exp.model_cfg.use_ban)
        hints = self._hints(images, questions)
        rows = [
            exp.tokenizer.encode(
                f"Answer the {t} question: " + q + h,
                max_length=exp.model_cfg.max_source_length)
            for q, t, h in zip(questions, tasks, hints)
        ]
        if use_prefix:
            prefixes = self._prefix_table(images, image_ids)
            if self._prefix_predict is None:
                self._prefix_predict = pmesh.make_prefix_predict_step(
                    exp.model_cfg, max_new_tokens=self.max_new_tokens,
                    mesh=exp.mesh)
            step = self._prefix_predict
        else:
            step = self._predict

        def dispatch(s: int):
            chunk = rows[s:s + B]
            k = len(chunk)
            pad = list(range(s, s + k)) + [s + k - 1] * (B - k)
            chunk = chunk + [chunk[-1]] * (B - k)
            width = bucket_width(max(len(r) for r in chunk),
                                 32, exp.model_cfg.max_source_length)
            ids, mask = pad_ids(chunk, width)
            batch = {"input_ids": ids, "text_mask": mask}
            if use_prefix:
                batch["prefix"] = prefixes[pad]
            elif needs_image:
                batch["images"] = np.asarray(images[pad], np.float32)
            return step(exp.params, exp.device_batch_from(batch)), k

        out: List[str] = []
        starts = list(range(0, n, B))
        pending = [dispatch(starts[0])] if starts else []
        for i, s in enumerate(starts):
            if i + 1 < len(starts):
                pending.append(dispatch(starts[i + 1]))
            preds, k = pending.pop(0)
            for row in np.asarray(preds)[:k]:
                out.append(exp.tokenizer.decode(row,
                                                skip_special_tokens=True))
        return out
