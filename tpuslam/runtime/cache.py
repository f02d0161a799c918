"""Persistent XLA compilation cache setup.

The fused VO chunk program is a large XLA program (full front-end + VO
state machine scanned over a 40-frame chunk); a cold compile costs
minutes.  The persistent cache turns every later process start into a
disk load (< a few seconds).  Plays the role the prebuilt FPGA
bitstream/firmware images (bin/design_1_wrapper.xsa, BOOT.BIN) play in
the reference: compile once, deploy many (/root/reference/bin/).
"""

from __future__ import annotations

import os

_DONE = False


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Idempotently enable the JAX persistent compilation cache."""
    global _DONE
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "TPUSLAM_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    if not _DONE:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # persist EVERYTHING: the dictionary's capacity-step programs
        # compile in ~0.6 s each and re-compiled on every process start
        # (3 s of the mapper budget) until the threshold was dropped
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _DONE = True
    return cache_dir
