"""Regenerate tests/golden/cgcnet_golden.npz (run manually).

Builds a small deterministic graph, transplants torch-oracle weights into
CGCNet, records logits for eval + train modes and the updated BN stats. The
fixture lets future sessions check numerical parity in milliseconds without
torch (tests/test_golden.py); regenerate only when the *reference contract*
changes, never to paper over a regression.
"""

import numpy as np
import torch

import jax

from pathlib import Path

from flax.traverse_util import flatten_dict


def main():
    jax.config.update("jax_platforms", "cpu")
    torch.manual_seed(7)
    rng = np.random.default_rng(7)

    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    sys.path.insert(0, str(Path(__file__).parent.parent))
    from test_parity_torch import build_oracle, compat_cfg, make_graph
    from transplant import transplant
    from cgcnet_tpu.nn.model import CGCNet

    cfg = compat_cfg()
    g = make_graph(rng)
    oracle = build_oracle(cfg)
    variables = transplant(oracle.state_dict(), cfg)

    model = CGCNet(cfg)
    out_train, mutated = model.apply(
        variables, g, train=True, mutable=["batch_stats"]
    )
    eval_vars = {"params": variables["params"],
                 "batch_stats": mutated["batch_stats"]}
    out_eval = model.apply(eval_vars, g, train=False)

    flat = {}
    for coll, tree in variables.items():
        for k, v in flatten_dict(tree, sep="/").items():
            flat[f"var::{coll}/{k}"] = np.asarray(v)
    for k, v in flatten_dict(mutated["batch_stats"], sep="/").items():
        flat[f"stat::{k}"] = np.asarray(v)

    out = Path(__file__).parent / "golden" / "cgcnet_golden.npz"
    out.parent.mkdir(exist_ok=True)
    np.savez_compressed(
        out,
        x=np.asarray(g.x), nbr=np.asarray(g.nbr),
        nbr_mask=np.asarray(g.nbr_mask), n_nodes=np.asarray(g.n_nodes),
        logits_train=np.asarray(out_train),
        logits_eval=np.asarray(out_eval),
        **flat,
    )
    print(f"wrote {out} ({out.stat().st_size/1e3:.0f} kB)")


if __name__ == "__main__":
    main()
