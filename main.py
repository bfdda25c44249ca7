"""CLI driver — same verbs and config schema as the reference's main.py.
Thin shim over multimodalpromptretrieval_tpu.cli (also installed as the
``mpr-train`` console script)."""

from multimodalpromptretrieval_tpu.cli import main

if __name__ == "__main__":
    main()
