"""``python -m pathtracerpython_tpu`` — render an SDL scene (see cli.main)."""

import sys

from pathtracerpython_tpu.cli.main import main

sys.exit(main())
