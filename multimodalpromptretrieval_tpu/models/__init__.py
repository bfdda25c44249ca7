"""Model layer: from-scratch JAX T5 + CLIP towers and the MPR_Gen variants."""
