from .platform import apply_platform_env, enable_compile_cache
