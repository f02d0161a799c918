"""Ahead-of-time export of the fused chunk program.

The deployment analog of the reference's prebuilt artifacts
(/root/reference/bin/design_1_wrapper.xsa + BOOT.BIN booted by
doc/petalinux/run:7-12): compile the fused VO chunk program ONCE, save a
serialized artifact, and start later processes from it with zero
retracing and zero XLA compilation.

Two layers already exist below this one:
  * the persistent compilation cache (runtime/cache.py) makes any
    same-program process start a disk load instead of a compile;
  * this module adds an EXPLICIT, shippable artifact (jax.export
    serialization) pinned to the exact input shapes, so a deployment
    can distribute the compiled program like the reference distributes
    its bitstream.

What neither layer can remove on THIS environment: the tunneled chip
must still receive and deserialize the ~22 MB executable at first use
(measured 11-137 s depending on tunnel load — PERF.md).  On a locally
attached TPU that load is sub-second disk-to-HBM traffic.
"""

from __future__ import annotations

import os

import numpy as np


def export_chunk_program(camera, cfg, chunk: int, path: str,
                         capacity: int = 1536) -> str:
    """Trace + export the fused chunk program for the given geometry and
    write the serialized artifact to `path`.  Returns `path`."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    from ..vo.fused import make_fused_chunk_fn, FusedShapes

    shapes = FusedShapes(chunk=chunk, capacity=capacity)
    init_carry, step, _ = make_fused_chunk_fn(camera, cfg, shapes)

    H, W = camera.height, camera.width
    carry = init_carry()
    args = (carry,
            jnp.zeros((chunk, H, W), jnp.uint8),
            jnp.zeros((chunk, H, W), jnp.uint8),
            jnp.zeros((chunk,), jnp.float32),
            jnp.zeros((chunk,), bool))
    exported = jexport.export(step)(*args)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_chunk_program(path: str):
    """Load an exported fused chunk artifact; returns a callable with
    the chunk_step signature (carry, lefts, rights, dts, active)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call


# ---------------------------------------------------------------------------
# compiled-executable artifacts (skip tracing AND XLA compilation)
# ---------------------------------------------------------------------------

_SRC_HASH = None


def _package_src_hash() -> str:
    """Hash of every tpuslam .py source: the compiled executable bakes
    the traced program in, so a stale artifact from an older source tree
    must never load (the key below includes this)."""
    global _SRC_HASH
    if _SRC_HASH is None:
        import hashlib
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for dirpath, _, names in sorted(os.walk(root)):
            for name in sorted(names):
                if name.endswith(".py"):
                    with open(os.path.join(dirpath, name), "rb") as f:
                        h.update(name.encode())
                        h.update(f.read())
        _SRC_HASH = h.hexdigest()
    return _SRC_HASH


def chunk_artifact_key(camera, cfg, chunk: int, capacity: int) -> str:
    """Content key for a compiled chunk artifact: any input that changes
    the traced program (package source, geometry, config, shapes) or the
    executable format (jax version, backend/device kind) changes the
    key."""
    import hashlib
    import jax

    dev = jax.devices()[0]
    desc = repr((jax.__version__, jax.default_backend(),
                 getattr(dev, "device_kind", str(dev)),
                 _package_src_hash(),
                 int(chunk), int(capacity),
                 int(camera.width), int(camera.height),
                 np.asarray(camera.K_l).tobytes(),
                 np.asarray(camera.local_transform).tobytes(),
                 float(camera.Tx_l), float(camera.Tx_r), repr(cfg)))
    return hashlib.sha256(desc.encode()).hexdigest()[:16]


def save_compiled_step(step_jit, example_args, path: str):
    """Lower + compile the jitted chunk step and write the PICKLED
    COMPILED EXECUTABLE (jax.experimental.serialize_executable) to
    `path`.  Unlike the jax.export artifact above (portable StableHLO,
    still XLA-compiled at load), this is the fully-compiled binary: a
    later process deserializes it straight into the runtime with zero
    tracing and zero compilation — the closest TPU analog of booting
    the reference's prebuilt BOOT.BIN/bitstream (doc/petalinux/run:7-8).
    Pinned to the exact jax version / device kind via chunk_artifact_key.

    Returns the jax.stages.Compiled (usable immediately)."""
    import pickle
    import jax
    from jax.experimental import serialize_executable as se

    compiled = step_jit.lower(*example_args).compile()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    try:
        payload, in_tree, out_tree = se.serialize(compiled)
        blob = ("compiled", payload, in_tree, out_tree)
    except Exception:
        # some backends (CPU thunks) cannot serialize executables; fall
        # back to the portable jax.export artifact — still skips
        # tracing, and the XLA compile at load hits the persistent cache
        exported = jax.export.export(step_jit)(*example_args)
        blob = ("export", exported.serialize())
    with open(tmp, "wb") as f:
        pickle.dump(blob, f)
    os.replace(tmp, path)
    return compiled


def load_compiled_step(path: str):
    """Load a save_compiled_step artifact -> jax.stages.Compiled
    (callable with the chunk_step signature)."""
    import pickle
    import jax
    from jax.experimental import serialize_executable as se

    with open(path, "rb") as f:
        blob = pickle.load(f)
    if blob[0] == "compiled":
        _, payload, in_tree, out_tree = blob
        return se.deserialize_and_load(payload, in_tree, out_tree)
    exported = jax.export.deserialize(blob[1])
    return jax.jit(exported.call)
