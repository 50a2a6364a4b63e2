"""Weight transplant: torch oracle state_dict -> flax variables for CGCNet."""

from __future__ import annotations

import numpy as np


def _t(x):
    # copy=True: state_dict tensors alias live module buffers (BN running
    # stats update in place), and jnp.asarray may zero-copy on CPU.
    return np.array(x.detach().cpu().numpy(), copy=True)


def transplant(state_dict, cfg) -> dict:
    """Map the torch oracle's state_dict onto CGCNet's variable tree."""
    sd = {k: _t(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}

    def block(torch_name, flax_name):
        p: dict = {}
        s: dict = {}
        for i in (1, 2, 3):
            if cfg.gcn_name == "SAGE":
                p[f"gcn{i}"] = {
                    "lin": {
                        "kernel": sd[f"{torch_name}.gcn{i}.weight"],
                        "bias": sd[f"{torch_name}.gcn{i}.bias"],
                    }
                }
            else:
                p[f"gcn{i}"] = {
                    "mlp_0": {
                        "kernel": sd[f"{torch_name}.gcn{i}.nn.0.weight"].T,
                        "bias": sd[f"{torch_name}.gcn{i}.nn.0.bias"],
                    },
                    "mlp_1": {
                        "kernel": sd[f"{torch_name}.gcn{i}.nn.2.weight"].T,
                        "bias": sd[f"{torch_name}.gcn{i}.nn.2.bias"],
                    },
                }
            if f"{torch_name}.bn{i}.weight" in sd:
                p[f"bn{i}"] = {
                    "scale": sd[f"{torch_name}.bn{i}.weight"],
                    "bias": sd[f"{torch_name}.bn{i}.bias"],
                }
                s[f"bn{i}"] = {
                    "mean": sd[f"{torch_name}.bn{i}.running_mean"],
                    "var": sd[f"{torch_name}.bn{i}.running_var"],
                }
        if f"{torch_name}.lin.weight" in sd:
            p["lin"] = {
                "kernel": sd[f"{torch_name}.lin.weight"].T,
                "bias": sd[f"{torch_name}.lin.bias"],
            }
        params[flax_name] = p
        if s:
            stats[flax_name] = s

    block("GCN_embed_1", "embed1")
    block("GCN_pool_1", "pool1")
    block("GCN_embed_2", "embed2")
    block("GCN_pool_2", "pool2")
    block("GCN_embed_3", "embed3")

    if cfg.jk:
        for i in (1, 2, 3):
            lstm = {}
            for nm in (
                "weight_ih_l0",
                "weight_hh_l0",
                "bias_ih_l0",
                "bias_hh_l0",
                "weight_ih_l0_reverse",
                "weight_hh_l0_reverse",
                "bias_ih_l0_reverse",
                "bias_hh_l0_reverse",
            ):
                lstm[nm] = sd[f"jk{i}.lstm.{nm}"]
            params[f"jk{i}"] = {
                "lstm": lstm,
                "att": {
                    "kernel": sd[f"jk{i}.att.weight"].T,
                    "bias": sd[f"jk{i}.att.bias"],
                },
            }

    # pred head: Sequential [Linear, act, (Dropout), ...Linear]
    lin_keys = sorted(
        {
            int(k.split(".")[1])
            for k in sd
            if k.startswith("pred_model.") and k.endswith(".weight")
        }
    )
    for j, idx in enumerate(lin_keys[:-1]):
        params[f"pred_{j}"] = {
            "kernel": sd[f"pred_model.{idx}.weight"].T,
            "bias": sd[f"pred_model.{idx}.bias"],
        }
    last = lin_keys[-1]
    params["pred_out"] = {
        "kernel": sd[f"pred_model.{last}.weight"].T,
        "bias": sd[f"pred_model.{last}.bias"],
    }

    import jax.numpy as jnp
    to_jnp = lambda tree: {
        k: (to_jnp(v) if isinstance(v, dict) else jnp.asarray(v))
        for k, v in tree.items()
    }
    return {"params": to_jnp(params), "batch_stats": to_jnp(stats)}
