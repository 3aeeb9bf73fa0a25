"""Packaging (reference ``setup.py:1-6`` analog)."""

from setuptools import find_packages, setup

setup(
    name="predict_pv_yield_tpu",
    version="0.1.0",
    description="TPU-native solar PV / GSP nowcasting framework (JAX/XLA/Pallas)",
    packages=find_packages(exclude=("tests", "tests.*")),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "orbax-checkpoint",
        "numpy",
        "pandas",
        "pyyaml",
        "einops",
    ],
    extras_require={
        "plots": ["matplotlib"],
        "sweeps": ["optuna"],
    },
)
