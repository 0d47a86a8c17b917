"""``python -m tame`` entry point."""

import sys

from tame.cli import main

sys.exit(main())
