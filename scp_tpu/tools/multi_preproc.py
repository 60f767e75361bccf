"""Process-parallel fan-out for any preprocessing CLI (reference
data_preproc/multi_data_preproc.py): spawn N copies with `--parts i/N`.

    python -m scp_tpu.tools.multi_preproc 8 \
        python -m scp_tpu.tools.preprocess --type kitti --ori_dir ... --out_dir ...
"""

from __future__ import annotations

import subprocess
import sys
from multiprocessing import Process


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    splits = int(argv[0])
    cmd = list(argv[1:])
    print("start:", cmd)
    procs = []
    for i in range(splits):
        p = Process(
            target=lambda c: subprocess.call(c),
            args=(cmd + ["--parts", f"{i}/{splits}"],),
        )
        p.start()
        procs.append(p)
    for p in procs:
        p.join()
    print("finished:", cmd)


if __name__ == "__main__":
    main()
