"""`python -m duet_tpu <BAM> <REF.fa> <OUT>` — same CLI as the `duet-tpu`
console script (duet_tpu.cli), for environments where entry points aren't
installed."""

import sys

from duet_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
