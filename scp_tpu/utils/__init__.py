from scp_tpu.utils.env import enable_compilation_cache, force_cpu

__all__ = ["enable_compilation_cache", "force_cpu"]
