import sys

from vq_tpu.cli import main

sys.exit(main())
