#!/usr/bin/env python
"""CLI entry: train / render a GB-NeRF-style scene on TPU.

Mirrors the reference entry (`python run.py --config <cfg.txt>`,
/root/reference/run.py:2511 + README.md:67). Accepts reference-style config
txt files directly (see gbnerf_tpu/config.py) plus dotted overrides:

    python run.py --config configs/scene1.txt
    python run.py --config configs/scene1.txt --set train.N_iters=2000 \
        --set render.N_samples=64
    python run.py --config configs/scene1.txt --render_only
"""
from __future__ import annotations

import argparse
import dataclasses
import sys


def parse_overrides(cfg, pairs):
    sections = {}
    for pair in pairs or []:
        key, _, value = pair.partition("=")
        if "." not in key or not value:
            raise SystemExit(f"--set expects section.field=value, got: {pair!r}")
        section, fname = key.split(".", 1)
        try:
            sub = getattr(cfg, section)
            cur = getattr(sub, fname)
        except AttributeError:
            raise SystemExit(f"unknown config key: {key}")
        if isinstance(cur, bool):
            val = value in ("True", "true", "1")
        elif isinstance(cur, int):
            val = int(value)
        elif isinstance(cur, float):
            val = float(value)
        else:
            val = value
        sections.setdefault(section, {})[fname] = val
    return dataclasses.replace(cfg, **{
        s: dataclasses.replace(getattr(cfg, s), **kv)
        for s, kv in sections.items()
    })


def force_platform():
    """`GBNERF_PLATFORM=cpu python run.py ...` pins the JAX backend.

    The axon TPU plugin in this image registers itself regardless of the
    standard JAX_PLATFORMS env var, so a config update is the only way to
    run the CLI on host CPU — e.g. to drive the full SPMD orchestration on
    a virtual device mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8)
    without TPU hardware. See docs/SPMD_CLI.md."""
    import os

    plat = os.environ.get("GBNERF_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def enable_compilation_cache():
    """Persistent XLA compilation cache: TPU compiles through the tunneled
    runtime take 1-5 min (10+ for the SD stack); caching them on disk makes
    every repeat run — resumes, render_only, eval sweeps — skip straight to
    execution. Overridable via JAX_COMPILATION_CACHE_DIR."""
    import os

    import jax

    if os.environ.get("GBNERF_NO_COMPILE_CACHE"):
        return
    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "gbnerf_xla"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception as e:  # cache is an optimization, never fatal
        print(f"[cache] compilation cache disabled: {e}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--config", required=True, help="config txt (reference format)")
    p.add_argument("--set", action="append", metavar="section.field=value",
                   help="override a config field (repeatable)")
    p.add_argument("--render_only", action="store_true",
                   help="skip training; render test + spiral paths from the "
                        "latest checkpoint (reference --render_only)")
    args = p.parse_args(argv)

    from gbnerf_tpu.config import load_reference_config
    cfg = load_reference_config(args.config)
    cfg = parse_overrides(cfg, args.set)
    if args.render_only:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, render_only=True))

    import os
    if not cfg.data.datadir or not os.path.isdir(cfg.data.datadir):
        raise SystemExit(f"datadir does not exist: {cfg.data.datadir!r}")

    force_platform()
    enable_compilation_cache()

    from gbnerf_tpu.train.loop import train, render_only
    if cfg.train.render_only:
        render_only(cfg)
    else:
        train(cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
