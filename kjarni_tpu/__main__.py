"""`python -m kjarni_tpu` == the kjarni CLI (cf. the reference's kjarni-cli
binary, kjarni-cli/src/main.rs)."""

from .cli.main import main

if __name__ == "__main__":
    raise SystemExit(main())
