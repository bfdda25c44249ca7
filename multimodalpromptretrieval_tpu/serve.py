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

    def _hints(self, images: np.ndarray, questions: Sequence[str]
               ) -> List[str]:
        exp = self.exp
        if exp.retrieval_index is None:
            return ["" for _ in questions]
        ids = exp.clip_tokenizer.tokenize(list(questions))
        q = self._embed(images, ids)
        return exp.retrieval_index.retrieve(
            jnp.asarray(q), use_quantifier=exp.use_quantifier, k=exp.k)

    def answer(self, images: np.ndarray, questions: Sequence[str],
               tasks: Optional[Sequence[str]] = None) -> List[str]:
        """images: (N, 3, R, R) preprocessed (ops/image.clip_preprocess);
        returns N answer strings."""
        from multimodalpromptretrieval_tpu.data.batching import (
            bucket_width,
            pad_ids,
        )

        exp = self.exp
        n = len(questions)
        tasks = list(tasks) if tasks is not None else ["open"] * n
        B = exp.batch_size
        hints = self._hints(images, questions)
        rows = [
            exp.tokenizer.encode(
                f"Answer the {t} question: " + q + h,
                max_length=exp.model_cfg.max_source_length)
            for q, t, h in zip(questions, tasks, hints)
        ]
        out: List[str] = []
        for s in range(0, n, B):
            chunk = rows[s:s + B]
            imgs = images[s:s + B]
            k = len(chunk)
            while len(chunk) < B:  # pad to the compiled batch size
                chunk.append(chunk[-1])
                imgs = np.concatenate([imgs, imgs[-1:]], axis=0)
            width = bucket_width(max(len(r) for r in chunk),
                                 32, exp.model_cfg.max_source_length)
            ids, mask = pad_ids(chunk, width)
            batch = {"input_ids": ids, "text_mask": mask}
            if exp.model_cfg.use_image_info or exp.model_cfg.use_ban:
                batch["images"] = np.asarray(imgs, np.float32)
            preds = np.asarray(self._predict(exp.params,
                                             exp.device_batch_from(batch)))
            for row in preds[:k]:
                out.append(exp.tokenizer.decode(row,
                                                skip_special_tokens=True))
        return out
