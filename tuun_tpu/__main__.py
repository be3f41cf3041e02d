import sys

# --platform must be applied before the package imports: engine modules
# create jnp constants at import time, which initializes the JAX backend,
# after which jax.config.update("jax_platforms", ...) is silently
# ineffective (the env-pinned platform stays the default).
if "--platform" in sys.argv:
    try:
        platform = sys.argv[sys.argv.index("--platform") + 1]
    except IndexError:
        platform = None
    if platform in ("cpu", "tpu"):
        import jax
        jax.config.update("jax_platforms", platform)

from .cli import main  # noqa: E402

sys.exit(main())
