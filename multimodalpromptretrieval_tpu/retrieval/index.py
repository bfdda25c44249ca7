"""Multimodal prompt-retrieval subsystem (device-resident index).

Reference behavior (dataset/VQAFeatureDataset.py:118-246) reproduced:

  * index rows are ``concat(clip.encode_image(img), clip.encode_text(q))``
    — (N, 1024) fp32, built once over the retrieval corpus and cached;
  * queries embed the same way; similarity is **Euclidean distance over the
    raw embeddings** (quirk #1), served by the fused Pallas distance+top-k
    kernel (ops/topk.py);
  * the training phase drops the single nearest neighbour (quirk #3);
  * answers among the top-k are majority-voted; ties go to the first
    retrieved answer reaching the max count (dict-insertion order of
    ``max(counts, key=counts.get)``);
  * certainty = maxcount/total maps onto six quantifier buckets via
    ``buckets[int(certainty * 5)]`` (quirk #11: k=1 is always "certainly");
  * prompt strings: ``"I believe the answer is {bucket} {answer}"`` or
    (quantifier off) ``"The most frequent answer is {answer}"``.

Cache layout: ``{cache_dir}/{key}/index.npz`` holding the embedding matrix,
answers and question info. The reference keys only by dataset class name
(quirk #4, stale across splits/encoders); the caller derives the key —
``Experiment._setup_retrieval`` uses a content hash (corpus entries + CLIP
config), with config ``retrieval_cache_compat`` restoring the reference's
class-name scheme.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from multimodalpromptretrieval_tpu.ops.topk import l2_topk

QUANTIFIER_BUCKETS = ["very unlikely", "unlikely", "maybe", "likely",
                      "very likely", "certainly"]


def majority_vote(answers: Sequence[str]) -> Tuple[str, float]:
    """(winner, certainty) with reference tie-breaking: first answer (in
    retrieval order) that attains the maximal count wins."""
    counts: Dict[str, int] = {}
    for a in answers:
        counts[a] = counts.get(a, 0) + 1
    pred = max(counts, key=counts.get)  # first-inserted max, like the ref
    certainty = max(counts.values()) / sum(counts.values())
    return pred, certainty


def quantifier_bucket(certainty: float) -> str:
    return QUANTIFIER_BUCKETS[int(certainty * (len(QUANTIFIER_BUCKETS) - 1))]


class RetrievalIndex:
    """Device-resident (N, 2*embed_dim) index + host-side answer metadata."""

    def __init__(self, embeddings: np.ndarray, answers: List[str],
                 question_info: Dict[str, List[str]],
                 is_training_phase: bool = True, retrieval_k: int = 15,
                 topk_impl: str = "auto"):
        self.embeddings = jnp.asarray(embeddings, jnp.float32)
        self.index_sq = jnp.sum(jnp.square(self.embeddings), axis=-1)
        self.answers = list(answers)
        self.question_info = question_info
        self.is_training_phase = is_training_phase
        self.retrieval_k = retrieval_k
        self.topk_impl = topk_impl

    def __len__(self) -> int:
        return len(self.answers)

    # -- build ------------------------------------------------------------

    @staticmethod
    def build(
        embed_fn: Callable[[np.ndarray, np.ndarray], np.ndarray],
        entries: List[dict],
        image_batch_fn: Callable[[Sequence[str]], np.ndarray],
        clip_tokenize: Callable[[Sequence[str]], np.ndarray],
        batch_size: int = 64,
        is_training_phase: bool = True,
        retrieval_k: int = 15,
        cache_path: Optional[str] = None,
        order: Optional[Sequence[int]] = None,
        topk_impl: str = "auto",
    ) -> "RetrievalIndex":
        """Embed the corpus in batches on device and assemble the index.

        ``embed_fn(images, text_ids) -> (B, 2*embed_dim)`` is the jitted
        CLIP image⊕text encoder. ``order`` optionally permutes the corpus
        (the reference iterates a shuffled DataLoader when building, so row
        order — though not content — is run-dependent there; pass a
        permutation to reproduce a specific run, default is entry order).
        """
        if cache_path and os.path.exists(cache_path):
            return RetrievalIndex.load(cache_path, is_training_phase,
                                       retrieval_k, topk_impl)
        idxs = list(order) if order is not None else list(range(len(entries)))
        embs = []
        answers: List[str] = []
        info: Dict[str, List[str]] = {"question_type": [], "question_id": [],
                                      "question": []}
        for s in range(0, len(idxs), batch_size):
            chunk = [entries[i] for i in idxs[s:s + batch_size]]
            images = image_batch_fn([e["image_name"] for e in chunk])
            text_ids = clip_tokenize([e["question"] for e in chunk])
            embs.append(np.asarray(embed_fn(images, text_ids)))
            answers.extend(e["answer"] for e in chunk)
            info["question_type"].extend(e["question_type"] for e in chunk)
            info["question_id"].extend(e["question_id"] for e in chunk)
            info["question"].extend(e["question"] for e in chunk)
        embeddings = np.concatenate(embs, axis=0).astype(np.float32)
        index = RetrievalIndex(embeddings, answers, info, is_training_phase,
                               retrieval_k, topk_impl)
        if cache_path:
            index.save(cache_path)
        return index

    def extend(self, other: "RetrievalIndex") -> None:
        """Append another corpus (use_additional_retrieval_data:
        dataset/VQAFeatureDataset.py:169-181 appends the synthetic ROCO
        cache)."""
        if set(self.question_info) != set(other.question_info):
            # a silently-skipped key would leave that info list shorter
            # than self.answers and IndexError on a later
            # retrieve(return_info=...) over an appended row
            raise ValueError(
                "question_info keys differ: "
                f"{sorted(self.question_info)} vs "
                f"{sorted(other.question_info)}")
        self.embeddings = jnp.concatenate(
            [self.embeddings, other.embeddings], axis=0)
        self.index_sq = jnp.sum(jnp.square(self.embeddings), axis=-1)
        self.answers.extend(other.answers)
        for k in self.question_info:
            self.question_info[k].extend(other.question_info[k])

    # -- persistence --------------------------------------------------------

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez_compressed(
            path, embeddings=np.asarray(self.embeddings),
            answers=json.dumps(self.answers),
            question_info=json.dumps(self.question_info))

    @staticmethod
    def load(path: str, is_training_phase: bool = True,
             retrieval_k: int = 15, topk_impl: str = "auto"
             ) -> "RetrievalIndex":
        with np.load(path, allow_pickle=False) as z:
            return RetrievalIndex(
                z["embeddings"], json.loads(str(z["answers"])),
                json.loads(str(z["question_info"])),
                is_training_phase, retrieval_k, topk_impl)

    # -- query ----------------------------------------------------------------

    def topk(self, query_embeddings, k: Optional[int] = None):
        """(distances, indices) for the query batch; applies the
        training-phase self-match skip."""
        k = k or self.retrieval_k
        return l2_topk(query_embeddings, self.embeddings, k,
                       index_sq=self.index_sq, impl=self.topk_impl,
                       skip_first=self.is_training_phase)

    def retrieve(
        self, query_embeddings, *, return_ans: bool = False,
        return_info: Optional[Sequence[str]] = None,
        return_dists: bool = False, use_quantifier: bool = True,
        k: Optional[int] = None,
    ):
        """Reference ``retrieve_closest_qa_pairs`` return-mode fan-out
        (dataset/VQAFeatureDataset.py:187-246)."""
        dists, idx = self.topk(query_embeddings, k)
        idx = np.asarray(idx)
        answers = [[self.answers[j] for j in row] for row in idx]
        if return_ans:
            return answers
        if return_info:
            out = []
            for row in idx:
                info = []
                for j in row:
                    info.extend(self.question_info[f][j] for f in return_info)
                out.append(info)
            return out
        if return_dists:
            return list(zip(answers, np.asarray(dists)))
        return self.format_prompts(idx, use_quantifier=use_quantifier)

    def format_prompts(self, idx, *, use_quantifier: bool = True):
        """Host half of the default (prompt) :meth:`retrieve` mode:
        majority vote + quantifier bucket over top-k indices. Split out
        so serving can dispatch :meth:`topk` per chunk and defer this
        (and the device fetch it implies) to the pipelined consume step
        (serve.MPRServer.answer)."""
        prompts = []
        for row in np.asarray(idx):
            pred, certainty = majority_vote(
                [self.answers[j] for j in row])
            if use_quantifier:
                prompts.append(
                    f"I believe the answer is {quantifier_bucket(certainty)}"
                    f" {pred}")
            else:
                prompts.append(f"The most frequent answer is {pred}")
        return prompts
