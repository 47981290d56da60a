import os

# Tests run on a virtual 8-device CPU mesh so sharding logic is exercised
# without TPU hardware (the driver separately dry-runs multichip compile).
# The axon harness imports jax at interpreter boot (sitecustomize) with
# JAX_PLATFORMS=axon, so env vars are too late — override via jax.config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the wavefront scans are expensive to compile,
# cheap to replay.

REFERENCE_DIR = "/root/reference"


def reference_path(*parts):
    return os.path.join(REFERENCE_DIR, *parts)
