#!/usr/bin/env python
"""Multi-host pod-slice launcher.

On a TPU pod slice, start ONE copy of this script per host (e.g. with
`gcloud compute tpus tpu-vm ssh --worker=all`), either relying on the TPU
runtime's automatic coordinator discovery or passing explicit
--coordinator/--num-processes/--process-id.  It initializes
`jax.distributed`, after which `jax.devices()` spans every chip in the
slice and the colorDepthSearch mesh shards targets across all of them
(parallel/mesh.py): each host feeds its local shard, per-mask maxima and
top-k merges ride ICI/DCN collectives instead of the reference's
driver-side collect (SparkColorMIPSearchProcessor.java:43-81).

Everything after `--` is forwarded to the CLI, e.g.:

  python scripts/run_multihost.py -- colorDepthSearch -m masks.json ...
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--coordinator", default=None,
                   help="coordinator address host:port (optional; the "
                        "TPU runtime usually auto-discovers)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("rest", nargs=argparse.REMAINDER)
    args = p.parse_args(argv)

    import jax

    kwargs = {}
    if args.coordinator:
        kwargs["coordinator_address"] = args.coordinator
    if args.num_processes is not None:
        kwargs["num_processes"] = args.num_processes
    if args.process_id is not None:
        kwargs["process_id"] = args.process_id
    jax.distributed.initialize(**kwargs)
    print(f"[multihost] process {jax.process_index()}/"
          f"{jax.process_count()}: {len(jax.local_devices())} local / "
          f"{len(jax.devices())} global devices", file=sys.stderr)

    cli_args = [a for a in args.rest if a != "--"]
    from colormipsearch_tpu.cli.main import main as cli_main
    return cli_main(cli_args)


if __name__ == "__main__":
    sys.exit(main())
