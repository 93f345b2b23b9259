"""Shared CLI helpers."""

from __future__ import annotations


def force_platform(platform: str | None) -> None:
    """Pin the JAX platform before the backend initializes.

    Must be called before any device query; works even when the hosting
    environment pre-imports jax with a different default platform.
    """
    if not platform:
        return
    import jax

    jax.config.update("jax_platforms", platform)


def add_platform_arg(parser) -> None:
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                        help="pin the JAX backend (default: auto)")
