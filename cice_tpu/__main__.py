"""`python -m cice_tpu` == `python -m cice_tpu.cli` (cice.setup analogue)."""

import sys

from .cli.main import main

if __name__ == "__main__":
    sys.exit(main())
