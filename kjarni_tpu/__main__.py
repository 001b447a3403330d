"""`python -m kjarni_tpu` == the kjarni CLI."""

import sys

from .cli.main import main

sys.exit(main())
