"""CLI drop-in for the reference's create_mapping.py trainer.

Trains the CrossModalMapping MLP (Linear-ReLU-Linear + learned logit_scale,
reference create_mapping.py:18-46) to align CLIP image embeddings with T5
text embeddings via symmetric InfoNCE, reports top-5 retrieval accuracy and
writes a PCA visualization. The reference's own __main__ is stale
(SURVEY.md component #10); this one runs.

    python create_mapping.py --features feats.npz [--epochs 30] \
        [--out mapping.npz] [--viz mapping.pdf] [--platform cpu]

``feats.npz`` must contain ``clip_image_features`` (N, D) and
``t5_text_features`` (N, D) — the batch keys the stale reference trainer
expected from its dataset.
"""

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--features", required=True)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--out", default="mapping.npz")
    p.add_argument("--viz", default=None)
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from multimodalpromptretrieval_tpu.train.checkpoint import (
        save_checkpoint,
    )
    from multimodalpromptretrieval_tpu.train.mapping import (
        retrieval_accuracy,
        train_mapping,
        visualize_mapping,
    )

    with np.load(args.features) as z:
        img = z["clip_image_features"].astype(np.float32)
        txt = z["t5_text_features"].astype(np.float32)
    params = train_mapping(img, txt, epochs=args.epochs,
                           batch_size=args.batch_size, lr=args.lr,
                           quiet=False)
    acc = retrieval_accuracy(params, img, txt, k=5)
    print(f"top-5 image->text retrieval accuracy: {acc:.3f}")
    save_checkpoint(args.out, params)
    if args.viz:
        visualize_mapping(params, img, txt, out_path=args.viz)
        print(f"wrote {args.viz}")


if __name__ == "__main__":
    main()
