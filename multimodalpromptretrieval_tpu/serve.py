"""Programmatic serving API: answer (image, question) pairs end-to-end.

The reference only exposes batch evaluation through main.py --test; this
wraps the same pipeline (CLIP prefix -> retrieval hint -> T5 greedy decode)
behind a reusable session so the framework can be embedded:

    exp = Experiment(cfg, train_mode=False, ...)
    server = MPRServer(exp)                  # loads the best checkpoint
    answers = server.answer(images, questions, tasks)

Requests are padded up to the compiled batch size / length buckets, so any
request size reuses the same jitted programs.

With retrieval on, the generative ViT path serves through DEVICE-SIDE
PROMPT CONSTRUCTION when token-exactness is provable: every hint the
frozen corpus can produce is pre-tokenized into a device-resident table
(retrieval/hints.py), and each chunk runs CLIP text embed → fused top-k →
in-graph majority vote → hint splice → T5 encode → greedy decode in ONE
jit — no retrieval fetch or host re-tokenization in the request loop
(any k: the vote + quantifier bucket run in-graph). The host path remains
for tokenizers without continuation encoding, unsafe junction characters
(retrieval/hints.py exactness contract), BAN / prediction-head / ResNet
variants, and ``prompt_fastpath=False``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import jax.numpy as jnp


class AnswerHandle:
    """Ticket for a :meth:`MPRServer.submit` request.

    ``result()`` blocks until the request's answers are complete (draining
    any older in-flight requests first — completion order is submission
    order) and returns the answer strings."""

    def __init__(self, server: "MPRServer", n_chunks: int):
        self._server = server
        self._remaining = n_chunks
        self.answers: List[str] = []

    def done(self) -> bool:
        return self._remaining == 0

    def result(self) -> List[str]:
        self._server._drain(self)
        if getattr(self, "_perm", None) is not None:
            # length-sorted dispatch (MPRServer length_sort): chunk i held
            # the rows at _perm[i*B:(i+1)*B] of the original request —
            # restore the caller's order exactly once
            out: List[str] = [""] * len(self.answers)
            for sorted_pos, orig_idx in enumerate(self._perm):
                out[orig_idx] = self.answers[sorted_pos]
            self.answers = out
            self._perm = None
        return self.answers


class MPRServer:
    def __init__(self, experiment, load_checkpoint: bool = True,
                 max_new_tokens: int = 20, prompt_fastpath: bool = True,
                 pipeline_depth: int = 1, quantize: Optional[str] = None,
                 spec_decode: int = 0, length_sort: bool = False):
        import os

        from multimodalpromptretrieval_tpu.train import checkpoint as ckpt

        self.exp = experiment
        self.max_new_tokens = max_new_tokens
        self.prompt_fastpath = prompt_fastpath
        if quantize not in (None, "int8", "int8_all"):
            raise ValueError(f"unknown quantize mode {quantize!r}")
        self.quantize = quantize
        # chunks allowed in flight before the pipeline starts consuming:
        # 1 = the classic software pipeline (host work for chunk i±1
        # overlaps chunk i's device run); deeper queues can hide more of
        # the fixed per-fetch tunnel round-trip at the cost of latency
        self.pipeline_depth = max(1, int(pipeline_depth))
        self._queue: List[tuple] = []  # (handle, pending_preds, k, classify)
        if load_checkpoint and os.path.exists(experiment.model_path):
            experiment.params, _, _ = ckpt.load_checkpoint(
                experiment.model_path, experiment.params)
        # Serving params: optionally int8-quantized (ops/quant — W8A8 on
        # the MXU at 2x the bf16 rate). "int8" quantizes the T5 stacks
        # only, so retrieval (whose corpus was embedded at full
        # precision) keeps identical neighbor ranks; "int8_all" also
        # quantizes the CLIP towers. The experiment's master params are
        # untouched — only the serve steps see the quantized copy.
        if quantize is not None:
            from multimodalpromptretrieval_tpu.ops.quant import (
                quantize_params,
            )

            self.params = quantize_params(
                experiment.params, t5=True, clip=(quantize == "int8_all"))
        else:
            self.params = experiment.params
        if experiment.retrieval_index is not None:
            experiment.retrieval_index.is_training_phase = False
            self._embed = experiment._clip_embed_fn()
        self._predict = experiment.predict_step()
        self._prefix_predict = None
        self._embed_prefix_step = None
        self._text_embed_step = None
        self._staged = None  # stage_images cache: (id -> row, emb, prefix)
        # hint-draft speculative decode block size (0 = lockstep greedy).
        # Only the fused fast path drafts (it has the vote winner
        # in-graph); outputs are identical either way — see
        # models/t5.t5_spec_greedy_decode
        self.spec_decode = max(0, int(spec_decode))
        # answer-length-aware chunk composition (VERDICT r3 item 3): a
        # fused chunk decodes until its SLOWEST row emits EOS, so mixed
        # workloads waste steps. With length_sort, a retrieval pre-pass
        # predicts each row's answer length (the retrieved majority
        # answer's length — the same signal the spec-decode drafts use)
        # and requests are re-chunked by it; answers return in the
        # caller's order (AnswerHandle unsorts). Costs one extra
        # retrieval fetch per request; opt-in, measured in bench.py.
        self.length_sort = bool(length_sort)
        self._fused_predict = None
        self._fused_key = None  # retrieval config the fused step captured
        self._hint_tables = None  # None = not built; False = unavailable
        self._draft_tables = None  # built alongside when spec_decode > 0
        self._hint_src = None  # (id, len) of the index the tables match

    def _ensure_hint_tables(self):
        """Build (once) the pre-tokenized hint tables for the device-side
        prompt-construction fast path (retrieval/hints.py); returns the
        tables or None when the corpus/tokenizer can't support it."""
        exp = self.exp
        src = (id(exp.retrieval_index), len(exp.retrieval_index),
               len(getattr(exp.tokenizer, "added", {})),
               exp.use_quantifier)  # the tables bake the bucket rows in
        if self._hint_src != src:
            # corpus extended in place, the index object replaced (even
            # by a same-length rebuild), or tokens added to the tokenizer
            # (hint rows could tokenize differently now): rebuild — also
            # clears a sticky False from a previously unsupported corpus
            self._hint_tables = None
            self._draft_tables = None
            self._hint_src = src
        if self._hint_tables is None:
            from multimodalpromptretrieval_tpu.retrieval.hints import (
                build_draft_tables,
                build_hint_tables,
            )

            tok = exp.tokenizer
            if not (hasattr(tok, "encode_continuation")
                    and hasattr(tok, "boundary_safe")):
                self._hint_tables = False
            else:
                self._hint_tables = build_hint_tables(
                    exp.retrieval_index, tok,
                    use_quantifier=exp.use_quantifier) or False
            if self._hint_tables and self.spec_decode:
                self._draft_tables = build_draft_tables(
                    exp.retrieval_index, tok,
                    max_length=self.max_new_tokens)
        return self._hint_tables or None

    def _hints(self, images: np.ndarray, questions: Sequence[str]
               ) -> List[str]:
        exp = self.exp
        if exp.retrieval_index is None or exp.model_cfg.use_ban:
            # BAN prompts never carry the retrieval hint (quirk #9; the
            # reference's BAN prepare_input builds task_prefix + question
            # only — T5VisionModelPredictionHeadBAN.py:116-139)
            return ["" for _ in questions]
        ids = exp.clip_tokenizer.tokenize(list(questions))
        # the serving params' CLIP subtree — identical to the master copy
        # except under quantize="int8_all" (the host retrieval path must
        # embed with the same tower the prefix/fused paths use). Chunked
        # to the experiment batch size: one un-chunked jit would compile
        # per distinct request size and allocate the whole request's ViT
        # activations at once.
        from multimodalpromptretrieval_tpu.data.batching import (
            encode_unique_chunks,
        )

        out = encode_unique_chunks(
            list(range(len(questions))),
            lambda i: (images[i], ids[i]), lambda x: x,
            lambda x: self._embed(*x, params=self.params["clip"]),
            exp.batch_size)
        return exp.retrieval_index.retrieve(
            jnp.asarray(out[0]), use_quantifier=exp.use_quantifier,
            k=exp.k)

    def _encode_unique(self, images: np.ndarray, image_ids: Sequence):
        """Encode each UNIQUE image once -> (id -> table row,
        (U, E) pooled retrieval embeddings, (U, P, d) T5 prefixes), both
        tables left ON DEVICE.

        The serving bottleneck is the wire, not the chip (the tunneled-TPU
        profile in docs/TPU_NOTES.md: uploads ~40-50 MB/s, downloads
        ~10-25 MB/s): each unique image crosses host -> device once, in
        the compute dtype (half the bytes under bf16 — identical results,
        the predict step casts on device anyway); the ViT trunk runs once
        per unique image for both consumers (token 0 of clip_image_tokens
        == encode_image); and the products never come back to the host —
        later stages gather rows device-side."""
        import numpy as _np

        from multimodalpromptretrieval_tpu.data.batching import (
            encode_unique_chunks,
        )
        from multimodalpromptretrieval_tpu.parallel import mesh as pmesh

        exp = self.exp
        if self._embed_prefix_step is None:
            self._embed_prefix_step = pmesh.make_image_embed_prefix_step(
                exp.model_cfg, mesh=exp.mesh)
        first: dict = {}
        for i, iid in enumerate(image_ids):
            first.setdefault(iid, i)
        if not first:  # zero-row request / empty staging call
            return {}, None, None
        np_dt = _np.dtype(exp.model_cfg.compute_dtype)
        emb, pref = encode_unique_chunks(
            list(first.values()), lambda i: images[i].astype(np_dt),
            lambda x: exp.device_batch_from({"x": x})["x"],
            lambda x: self._embed_prefix_step(self.params, x),
            exp.batch_size, n_out=2)
        return {iid: j for j, iid in enumerate(first)}, emb, pref

    def stage_images(self, images: np.ndarray, image_ids: Sequence) -> None:
        """Upload + encode a corpus of images once; cache the device-side
        retrieval-embedding and prefix tables keyed by id.

        answer() calls whose ``image_ids`` are all staged skip the image
        wire entirely — the steady-state serving mode (the SLAKE test
        split asks ~11 questions per image; a server keeps hot images
        resident). Re-staging replaces the cache."""
        self._staged = self._encode_unique(images, image_ids)

    def _ensure_text_step(self):
        import jax

        from multimodalpromptretrieval_tpu.models.clip import (
            clip_encode_text,
        )
        from multimodalpromptretrieval_tpu.models.mprgen import cast_compute

        if self._text_embed_step is None:
            mcfg = self.exp.model_cfg

            @jax.jit
            def text_step(params, ids):
                clip = cast_compute(params, mcfg)["clip"]
                return clip_encode_text(clip, mcfg.clip, ids)

            self._text_embed_step = text_step
        return self._text_embed_step

    def _dispatch_chunk_retrieval(self, questions: Sequence[str],
                                  emb_dev, rows: np.ndarray):
        """Dispatch ONE chunk's retrieval work to the device — text tower
        over the chunk's questions, (img ⊕ txt) query concat from the
        device-side image-embedding table, fused L2 top-k — and return
        the (k_valid, device indices) WITHOUT fetching. :meth:`answer`
        dispatches every chunk, fetches all indices in one round-trip,
        and defers the host half (majority vote + hint formatting) into
        its pipelined loop, overlapped with the in-flight predict."""
        from multimodalpromptretrieval_tpu.models.clip import (
            truncate_text_ids,
        )

        exp = self.exp
        B = exp.batch_size
        ids = truncate_text_ids(exp.clip_tokenizer.tokenize(list(questions)))
        k = len(ids)
        if k < B:
            ids = np.concatenate([ids, np.repeat(ids[-1:], B - k, axis=0)])
            rows = np.concatenate([rows, np.repeat(rows[-1:], B - k)])
        txt = self._ensure_text_step()(self.params, jnp.asarray(ids))
        img = jnp.take(emb_dev, jnp.asarray(rows), axis=0)
        q = jnp.concatenate([img.astype(jnp.float32),
                             txt.astype(jnp.float32)], axis=1)
        _, idx = exp.retrieval_index.topk(q, k=exp.k)
        return k, idx

    def _dispatch_all_retrieval(self, questions: Sequence[str], emb_dev,
                                rowmap: np.ndarray) -> np.ndarray:
        """Dispatch EVERY chunk's retrieval (text tower + device top-k)
        and fetch the concatenated indices in ONE host round-trip —
        through this environment's tunnel each fetch costs a fixed
        ~26 ms regardless of payload (docs/TPU_NOTES.md), so per-chunk
        fetches were measured to give back the overlap they bought.
        Shared by the host-path dispatch and the length-sort pre-pass so
        the chunk/fetch policy cannot drift between them."""
        B = self.exp.batch_size
        parts = [self._dispatch_chunk_retrieval(
            questions[s:s + B], emb_dev, rowmap[s:s + B])
            for s in range(0, len(questions), B)]
        idx_all = (jnp.concatenate([idx[:kv] for kv, idx in parts])
                   if len(parts) > 1 else parts[0][1][:parts[0][0]])
        return np.asarray(idx_all)  # the single retrieval sync

    def _length_sort_order(self, questions: Sequence[str],
                           rowmap: np.ndarray, emb_dev) -> np.ndarray:
        """Stable row order by PREDICTED answer length for the fused
        path: one retrieval pre-pass (text tower + device top-k per
        chunk, indices fetched in ONE round-trip — the same shape the
        host path's up-front dispatch uses), then the formatted hint
        length of each row's majority answer is the sort key. Short
        predicted answers group into chunks that hit all-rows-EOS early;
        long ones stop stalling them. The fused chunk still runs its own
        in-graph retrieval, so answers stay token-exact — the pre-pass
        only chooses chunk membership."""
        exp = self.exp
        idx_np = self._dispatch_all_retrieval(questions, emb_dev, rowmap)
        hints = exp.retrieval_index.format_prompts(
            idx_np, use_quantifier=exp.use_quantifier)
        key = np.asarray([len(h) for h in hints])
        return np.argsort(key, kind="stable")

    def answer(self, images: np.ndarray, questions: Sequence[str],
               tasks: Optional[Sequence[str]] = None,
               image_ids: Optional[Sequence] = None) -> List[str]:
        """Synchronous one-shot: ``submit(...).result()`` (see below)."""
        return self.submit(images, questions, tasks,
                           image_ids=image_ids).result()

    def submit(self, images: np.ndarray, questions: Sequence[str],
               tasks: Optional[Sequence[str]] = None,
               image_ids: Optional[Sequence] = None) -> AnswerHandle:
        """images: (N, 3, R, R) preprocessed (ops/image.clip_preprocess);
        returns an :class:`AnswerHandle` whose ``result()`` yields the N
        answer strings.

        ``submit`` returns with up to one chunk still in flight on the
        device, so a caller that pipelines requests
        (``h = submit(next); prev.result()``) overlaps the previous
        request's tail (final ~26 ms fetch + detokenize) and the next
        request's head (first chunk's SPM encode) with device compute —
        the per-call host edges a serial ``answer()`` loop exposes.

        ``image_ids`` (optional): a stable id per row; rows sharing an id
        share one upload + ViT pass, and ids previously passed to
        :meth:`stage_images` skip the image wire entirely (``images`` may
        then be anything indexable — it is not touched).

        The generative-prefix path runs a per-chunk software pipeline:
        every chunk's retrieval (text tower + device top-k) is dispatched
        up front and the indices come back in ONE host round-trip; then
        chunk i's predict runs on device while the host formats chunk
        i+1's hints / re-tokenizes it and detokenizes chunk i-1. The
        per-request host work (~40 ms of a 300 ms steady call: majority
        vote + SPM encode + detok) hides behind device compute without
        adding syncs — through this environment's tunnel every fetch
        pays a fixed ~26 ms round-trip (docs/TPU_NOTES.md), so a
        fetch-per-chunk variant measured neutral-to-worse.
        """
        from multimodalpromptretrieval_tpu.data.batching import (
            bucket_width,
            pad_rows,
        )
        from multimodalpromptretrieval_tpu.parallel import mesh as pmesh

        exp = self.exp
        mcfg = exp.model_cfg
        n = len(questions)
        if n == 0:  # empty request: an already-done handle, result() == []
            return AnswerHandle(self, 0)
        tasks = list(tasks) if tasks is not None else ["open"] * n
        B = exp.batch_size
        needs_image = mcfg.use_image_info or mcfg.use_ban
        classify = mcfg.use_prediction_head or mcfg.use_ban
        # Generative ViT variant: one wire crossing + one trunk pass per
        # UNIQUE image feeds both retrieval and the decode prefix. Other
        # variants (BAN / prediction head / ResNet tower) take the plain
        # per-batch image path.
        use_prefix = needs_image and not classify and mcfg.resnet is None
        starts = list(range(0, n, B))
        rowmap = pref_dev = None
        if use_prefix:
            ids_for_dedup = (list(image_ids) if image_ids is not None
                             else list(range(n)))
            if (self._staged is not None
                    and all(i in self._staged[0] for i in ids_for_dedup)):
                pos, emb_dev, pref_dev = self._staged  # no image wire
            else:
                pos, emb_dev, pref_dev = self._encode_unique(
                    images, ids_for_dedup)
            rowmap = np.asarray([pos[i] for i in ids_for_dedup])
            if exp.retrieval_index is not None and self.prompt_fastpath:
                ht = self._ensure_hint_tables()
                if ht is not None:
                    prompts = [f"Answer the {t} question: " + q
                               for q, t in zip(questions, tasks)]
                    if all(exp.tokenizer.concat_safe(p, ht.first_char)
                           for p in prompts):
                        perm = None
                        if self.length_sort and n > B:
                            perm = self._length_sort_order(
                                questions, rowmap, emb_dev)
                            prompts = [prompts[i] for i in perm]
                            questions = [questions[i] for i in perm]
                            rowmap = rowmap[perm]
                        handle = self._answer_fused(
                            prompts, questions, rowmap, emb_dev, pref_dev)
                        handle._perm = perm
                        return handle
            if self._prefix_predict is None:
                self._prefix_predict = pmesh.make_prefix_predict_step(
                    mcfg, max_new_tokens=self.max_new_tokens,
                    mesh=exp.mesh)
            step = self._prefix_predict
            hints = None  # produced chunk-by-chunk in the pipeline below
        else:
            hints = self._hints(images, questions)
            step = self._predict

        if use_prefix and exp.retrieval_index is not None and starts:
            idx_np = self._dispatch_all_retrieval(questions, emb_dev,
                                                  rowmap)

        def chunk_hints(s: int):
            """Hints for the chunk at ``s``; the returned thunk defers
            the host-side majority vote + formatting into the pipelined
            loop below so it overlaps the in-flight predict."""
            if not use_prefix or exp.retrieval_index is None:
                h = (hints[s:s + B] if hints is not None
                     else [""] * min(B, n - s))
                return lambda: h
            return lambda: exp.retrieval_index.format_prompts(
                idx_np[s:s + B], use_quantifier=exp.use_quantifier)

        def dispatch(s: int, chunk_h: List[str]):
            texts = [f"Answer the {t} question: " + q + h
                     for q, t, h in zip(questions[s:s + B],
                                        tasks[s:s + B], chunk_h)]
            # one native call tokenizes the whole chunk (spm.encode_rows)
            rows, lens = exp.tokenizer.encode_rows(
                texts, max_length=mcfg.max_source_length)
            k = len(texts)
            pad = list(range(s, s + k)) + [s + k - 1] * (B - k)
            sel = np.asarray(pad) - s  # fill rows repeat the last row
            rows, lens = rows[sel], lens[sel]
            width = bucket_width(int(lens.max()),
                                 32, exp.model_cfg.max_source_length)
            ids, mask = pad_rows(rows, lens, width)
            batch = {"input_ids": ids, "text_mask": mask}
            if use_prefix:
                # device-side gather from the prefix table — prefixes
                # never cross the wire
                batch["prefix"] = jnp.take(
                    pref_dev, jnp.asarray(rowmap[pad]), axis=0)
            elif needs_image:
                batch["images"] = np.asarray(images[pad], np.float32)
            return step(self.params, exp.device_batch_from(batch)), k

        return self._run_pipeline(
            starts, lambda i, s: dispatch(s, chunk_hints(s)()),
            classify=classify)

    def _run_pipeline(self, starts, dispatch_fn,
                      classify: bool = False) -> AnswerHandle:
        """Software pipeline over chunks: chunk i's predict is in flight
        while the host encodes chunk i+1 and consumes chunk i-1's
        answers. ``dispatch_fn(i, start) -> (pending_preds, n_valid)``.
        Shared by the host and fused serve loops so padding/pipeline
        policy can't drift between them.

        The pending queue lives on the server (not the call frame), so
        the LAST chunk stays in flight when :meth:`submit` returns — the
        cross-request half of the pipeline. ``result()`` drains it."""
        handle = AnswerHandle(self, len(starts))
        for i, s in enumerate(starts):
            self._queue.append((handle, *dispatch_fn(i, s), classify))
            while len(self._queue) > self.pipeline_depth:
                self._consume_one()
        return handle

    def _consume_one(self) -> None:
        exp = self.exp
        handle, preds, k, classify = self._queue.pop(0)
        for row in np.asarray(preds)[:k]:
            if classify:  # BAN / prediction-head: class id -> answer
                handle.answers.append(exp.label2ans[int(row)])
            else:
                handle.answers.append(exp.tokenizer.decode(
                    row, skip_special_tokens=True))
        handle._remaining -= 1

    def _drain(self, handle: AnswerHandle) -> None:
        while not handle.done():
            self._consume_one()

    def _answer_fused(self, prompts: Sequence[str],
                      questions: Sequence[str], rowmap: np.ndarray,
                      emb_dev, pref_dev) -> AnswerHandle:
        """Device-side prompt-construction serve loop: per chunk, ONE jit
        runs CLIP text embed → fused top-k → in-graph majority vote →
        pre-tokenized hint splice → T5 encode + greedy decode
        (parallel/mesh.make_fused_serve_step). The host only tokenizes the
        question prefix and detokenizes answers — no retrieval fetch, no
        hint re-tokenization. Token-exact vs the host path (the caller
        checked boundary safety; tests/test_serve_fastpath.py)."""
        from multimodalpromptretrieval_tpu.data.batching import (
            bucket_width,
            pad_rows,
        )
        from multimodalpromptretrieval_tpu.models.clip import (
            truncate_text_ids,
        )
        from multimodalpromptretrieval_tpu.parallel import mesh as pmesh

        exp = self.exp
        mcfg = exp.model_cfg
        ht = self._hint_tables
        index = exp.retrieval_index
        B = exp.batch_size
        n = len(prompts)
        # keyed by everything the step captures at trace time — rebuilt
        # when the retrieval config changes underneath the server (e.g.
        # exp.k reassigned, or the index flipped back to training phase),
        # mirroring _ensure_hint_tables' invalidation
        spec = self.spec_decode if self._draft_tables is not None else 0
        fkey = (exp.k, exp.use_quantifier, exp.tokenizer.eos_id,
                index.topk_impl, index.is_training_phase, spec)
        if self._fused_predict is None or self._fused_key != fkey:
            self._fused_predict = pmesh.make_fused_serve_step(
                mcfg, k=exp.k, use_quantifier=exp.use_quantifier,
                eos_id=exp.tokenizer.eos_id,
                max_new_tokens=self.max_new_tokens,
                topk_impl=index.topk_impl,
                skip_first=index.is_training_phase, spec_block=spec,
                mesh=exp.mesh)
            self._fused_key = fkey
        step = self._fused_predict
        spec_args = (self._draft_tables.ids,) if spec else ()

        def dispatch(s: int):
            # one native call tokenizes the whole chunk (spm.encode_rows)
            rows, lens = exp.tokenizer.encode_rows(
                prompts[s:s + B], add_eos=False)
            k = rows.shape[0]
            pad = list(range(s, s + k)) + [s + k - 1] * (B - k)
            sel = np.asarray(pad) - s  # fill rows repeat the last row
            rows, lens = rows[sel], lens[sel]
            width = bucket_width(
                int(lens.max()) + ht.max_hint_len + 1,
                32, mcfg.max_source_length)
            q_ids, _ = pad_rows(rows, lens, width)
            q_len = np.minimum(lens, width).astype(np.int32)
            cids = truncate_text_ids(
                exp.clip_tokenizer.tokenize(list(questions[s:s + B])))
            if k < B:
                cids = np.concatenate(
                    [cids, np.repeat(cids[-1:], B - k, axis=0)])
            gather = jnp.asarray(rowmap[pad])
            batch = exp.device_batch_from(
                {"q_ids": q_ids, "q_len": q_len, "clip_text_ids": cids,
                 "prefix": jnp.take(pref_dev, gather, axis=0),
                 "img_emb": jnp.take(emb_dev, gather, axis=0)})
            return step(self.params, batch, index.embeddings,
                        index.index_sq, ht.aid, ht.hint_ids,
                        ht.hint_len, *spec_args), k

        return self._run_pipeline(list(range(0, n, B)),
                                  lambda i, s: dispatch(s))
