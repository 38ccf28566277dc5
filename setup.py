"""Build parity: /root/reference/setup.py compiles five CUDA extension
modules; here the device kernels are Pallas (compiled through XLA at
runtime), and the native code is the host-side batch packer
(csrc/host/plan_packer.cpp). The engine falls back to pure Python when
the extension isn't built, so `pip install -e .` / `python setup.py
build_ext --inplace` are optional accelerations, not requirements."""

from setuptools import Extension, find_packages, setup

ext_modules = [
    Extension(
        name="vllm_tpu._plan_packer",
        sources=["csrc/host/plan_packer.cpp"],
        extra_compile_args=["-O3", "-std=c++17"],
    ),
]

setup(
    name="vllm_tpu",
    version="0.1.0",
    description="TPU-native LLM serving engine (paged KV cache, "
    "continuous batching, INT8 quantization, JAX/Pallas)",
    packages=find_packages(exclude=("tests", "benchmarks", "examples")),
    ext_modules=ext_modules,
    python_requires=">=3.10",
)
