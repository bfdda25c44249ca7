"""Build the synthetic-ROCO retrieval cache.

The reference builds this implicitly by constructing a ROCOFeatureDataset
and calling create_retrieval_dataset, caching to
``synthetic_data/cache/ROCOFeatureDataset/`` (dataset/VQAFeatureDataset.py:
122-181); ``use_additional_retrieval_data`` then concatenates it onto the
main index. This tool does the same for the TPU build: embeds every ROCO
QA row with CLIP (image ⊕ question) and writes ``index.npz`` where
train/experiment.py's ``use_additional_retrieval_data`` path looks for it.

    python synthetic_data/build_roco_cache.py <datafolder> \
        [--out synthetic_data/cache/ROCOFeatureDataset/index.npz] \
        [--clip-checkpoint path.pt] [--platform cpu]
"""

import argparse
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("datafolder", help="folder containing ROCO/{train.csv,imgs}")
    p.add_argument("--out", default=os.path.join(
        "synthetic_data", "cache", "ROCOFeatureDataset", "index.npz"))
    p.add_argument("--clip-checkpoint", default=None,
                   help="OpenAI/PubMedCLIP torch checkpoint to convert")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from multimodalpromptretrieval_tpu.data.datasets import ROCODataset
    from multimodalpromptretrieval_tpu.data.images import ImageCache
    from multimodalpromptretrieval_tpu.models.clip import (
        CLIPConfig,
        clip_encode_image,
        clip_encode_text,
        init_clip,
    )
    from multimodalpromptretrieval_tpu.retrieval.index import RetrievalIndex
    from multimodalpromptretrieval_tpu.text import CLIPBPETokenizer

    cfg = CLIPConfig.vit_b32()
    if args.clip_checkpoint:
        import torch

        from multimodalpromptretrieval_tpu.models import convert

        obj = torch.load(args.clip_checkpoint, map_location="cpu",
                         weights_only=False)
        if isinstance(obj, dict) and "state_dict" in obj:
            obj = obj["state_dict"]
        sd = convert.state_dict_to_numpy(obj)
        cfg = convert.clip_config_from_openai_sd(sd)
        params = convert.clip_from_openai(sd, cfg)
    else:
        params = init_clip(jax.random.PRNGKey(0), cfg)

    ds = ROCODataset("train", os.path.join(args.datafolder, "ROCO"))
    cache = ImageCache.build(os.path.join(args.datafolder, "ROCO"),
                             ds.entries, "train",
                             size=cfg.image_resolution)
    tok = CLIPBPETokenizer.build_toy(context_length=cfg.context_length)

    @jax.jit
    def embed(images, ids):
        return jnp.concatenate([
            clip_encode_image(params, cfg, images),
            clip_encode_text(params, cfg, ids)], axis=1)

    index = RetrievalIndex.build(
        lambda imgs, ids: embed(jnp.asarray(imgs), jnp.asarray(ids)),
        ds.entries,
        lambda names: cache.batch(names),
        lambda qs: tok.tokenize(qs),
        batch_size=args.batch_size,
        cache_path=args.out,
    )
    print(f"wrote {args.out}: {len(index)} rows, "
          f"dim {index.embeddings.shape[1]}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
