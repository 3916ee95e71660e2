"""Engine registry: one dispatch point for EP / IHGP / GIEKF.

The three engines share the reference's calling convention
(SURVEY 1: engine(w, t, y, ss, mom, xt, ...)); applications select one by
name.  Centralized here so the apps (missing data, denoising, source
separation, experiment drivers) don't each carry an if/elif ladder.
"""

from __future__ import annotations

from typing import Optional

ENGINES = ("ep", "ihgp", "giekf")


def get_engine(name: str):
    """Returns (infer_fn, energy_fn, config_cls) for an engine name."""
    if name == "ep":
        from nsgp_tpu.inference import ep

        return ep.ep_infer, ep.ep_energy, ep.EPConfig
    if name == "ihgp":
        from nsgp_tpu.inference import ihgp

        return ihgp.ihgp_infer, ihgp.ihgp_energy, ihgp.IHGPConfig
    if name == "giekf":
        from nsgp_tpu.inference import giekf

        return giekf.giekf_infer, giekf.giekf_energy, giekf.GIEKFConfig
    raise ValueError(f"unknown engine {name!r}; expected one of {ENGINES}")


def infer(engine: str, model, params, y, mask=None, config=None, **cfg_kwargs):
    """Run posterior inference with the named engine.

    ``config`` takes precedence; otherwise a config is built from
    ``cfg_kwargs`` (empty = engine defaults).  Returns the engine's result
    (all carry .Eft / .Varft / .nlZ / .sites).
    """
    infer_fn, _, config_cls = get_engine(engine)
    cfg = config if config is not None else (
        config_cls(**cfg_kwargs) if cfg_kwargs else config_cls()
    )
    return infer_fn(model, params, y, mask, cfg)


def energy(engine: str, model, params, y, mask=None, config=None, **cfg_kwargs):
    """Marginal-likelihood energy of the named engine (autodiff-ready)."""
    _, energy_fn, config_cls = get_engine(engine)
    cfg = config if config is not None else (
        config_cls(**cfg_kwargs) if cfg_kwargs else config_cls()
    )
    return energy_fn(model, params, y, mask, cfg)
