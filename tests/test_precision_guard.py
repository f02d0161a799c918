"""Guard the framework-wide matmul precision pin.

TPU dot_general defaults to bfloat16 inputs; tpuslam/__init__.py pins
jax_default_matmul_precision=highest because the fused VO's pose chain
corrupts below the bf16 quantum at KITTI-scale coordinates (~2 m at
300 m — see the round-3 bf16 pose-chain fix).  This test fails if the
pin is ever dropped or overridden at import.
"""


def test_matmul_precision_pinned():
    import tpuslam  # noqa: F401  (the import applies the pin)
    import jax

    assert jax.config.jax_default_matmul_precision == "highest"
