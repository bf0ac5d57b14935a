"""Generate a PJRT_Client_Create options file for the axon tunnel plugin.

The native PJRT backend (native/src/pjrt_backend.cc) is plugin-generic:
on a real TPU VM, libtpu.so needs NO client-create options.  This box's
TPU is reached through the axon tunnel plugin (/opt/axon/libaxon_pjrt.so)
instead, which takes the same named options jax's register() passes
(topology, session_id, remote_compile, ... -- see
/root/.axon_site/axon/register/pjrt.py).  This tool writes those options
in the backend's key=type:value file format plus the env vars the plugin
reads, so `upscale_cli` can serve on the real chip with no Python in the
process:

    python tools/make_axon_pjrt_options.py /tmp/axon_opts.txt
    export JOSHUPSCALE_PJRT_PLUGIN=/opt/axon/libaxon_pjrt.so
    export JOSHUPSCALE_PJRT_OPTIONS=/tmp/axon_opts.txt
    export AXON_COMPAT_VERSION=49   # printed by this tool
    native/build/upscale_cli <package> in.raw out.raw
"""

from __future__ import annotations

import os
import sys
import uuid

# axon.register.COMPAT_VERSION -- the client<->terminal wire version the
# Rust plugin reads from AXON_COMPAT_VERSION.
_DEFAULT_COMPAT_VERSION = 49
# axon.register.MULTIHOST_RANK -- the monoclient sentinel (u32::MAX).
_MULTIHOST_RANK = 0xFFFF_FFFF


def write_options(path: str) -> dict:
    """Write the options file; returns the env vars to set."""
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    remote_compile = os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1"
    session_id = str(uuid.uuid4())
    lines = [
        "# PJRT_Client_Create options for libaxon_pjrt.so",
        f"remote_compile=i:{1 if remote_compile else 0}",
        "local_only=i:0",
        "priority=i:0",
        f"topology=s:{gen}:1x1x1",
        "n_slices=i:1",
        f"session_id=s:{session_id}",
        f"rank=i:{_MULTIHOST_RANK}",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    try:
        from axon.register import COMPAT_VERSION  # type: ignore
    except Exception:
        COMPAT_VERSION = _DEFAULT_COMPAT_VERSION
    return {
        "AXON_COMPAT_VERSION": str(COMPAT_VERSION),
        # Same loopback-relay setup the sitecustomize boot hook applies.
        "AXON_POOL_SVC_OVERRIDE": "127.0.0.1",
        "AXON_LOOPBACK_RELAY": "1",
        "TPU_WORKER_HOSTNAMES": "localhost",
        "TPU_SKIP_MDS_QUERY": "1",
    }


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    env = write_options(sys.argv[1])
    for k, v in env.items():
        print(f"export {k}={v}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
