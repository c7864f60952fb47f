"""torch -> JAX weight converter for the reference's released checkpoints.

The reference ships `ent_ho3d.pth`: a dict of state_dicts
{'encoderRGB', 'decoderPose', 'p_nf'} (CrossModalHand.py:573-587), where
encoderRGB is the MHEnt module — feat_extractor (torchvision resnet + l1/l2
heads), q_z_giv_i (RealNVP), det_head. This module maps those tensors into
the mhentropy_tpu param pytrees (BASELINE config 5 deliverable).

Usage:
    python -m tools.convert_torch ent_ho3d.pth out_dir/
"""

from __future__ import annotations

import re
import sys

import numpy as np


def _np(t):
    return np.asarray(t.detach().cpu().numpy()) if hasattr(t, "detach") else np.asarray(t)


def convert_resnet(sd: dict, prefix: str) -> tuple[dict, dict]:
    """torchvision resnet state_dict -> (flax params, batch_stats) for
    models/resnet.ResNet."""
    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for key, val in sd.items():
        if not key.startswith(prefix):
            continue
        k = key[len(prefix):]
        v = _np(val)
        m = re.match(r"layer(\d+)\.(\d+)\.(.*)", k)
        if m:
            stage, block, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            scope = f"layer{stage}_{block}"
            rest = rest.replace("downsample.0", "downsample_conv").replace(
                "downsample.1", "downsample_bn"
            )
        else:
            scope, rest = None, k
        parts = rest.split(".")
        name, leaf = parts[0], parts[-1]
        if name == "fc":
            # fc is Identity in the reference; stock torchvision
            # checkpoints carry a real head — drop weight AND bias (the
            # leaf == "bias" branch below would otherwise leak a stray
            # params['fc']['bias'] subtree that breaks strict restores).
            continue
        path = ([scope] if scope else []) + [name]
        if leaf == "weight" and v.ndim == 4:  # conv OIHW -> HWIO
            put(params, path + ["kernel"], v.transpose(2, 3, 1, 0))
        elif leaf == "weight" and v.ndim == 1:  # bn scale
            put(params, path + ["scale"], v)
        elif leaf == "bias":
            put(params, path + ["bias"], v)
        elif leaf == "running_mean":
            put(stats, path + ["mean"], v)
        elif leaf == "running_var":
            put(stats, path + ["var"], v)
        # num_batches_tracked / fc.* are dropped (fc is Identity in the ref).
    return params, stats


def convert_linear(sd: dict, key: str) -> dict:
    return {"w": _np(sd[f"{key}.weight"]).T, "b": _np(sd[f"{key}.bias"])}


def convert_realnvp(sd: dict, prefix: str, n_layers: int):
    """Reference RealNVP state_dict -> flows.realnvp.RealNVPParams."""
    import jax.numpy as jnp

    from mhentropy_tpu.flows.realnvp import RealNVPParams

    def t(name):
        return _np(sd[prefix + name])

    def stack(fmt, transpose=False):
        out = []
        for i in range(n_layers):
            v = t(fmt.format(i=i))
            out.append(v.T if transpose else v)
        return jnp.asarray(np.stack(out))

    has_cond = f"{prefix}s.0.c.0.weight" in sd
    d = {
        "masks": jnp.asarray(t("mask")),
    }
    for net in ("s", "t"):
        for j in range(3):
            d[f"{net}_w{j}"] = stack(f"{net}.{{i}}.l.{j}.weight", transpose=True)
            d[f"{net}_b{j}"] = stack(f"{net}.{{i}}.l.{j}.bias")
        for j in range(2):
            if has_cond:
                d[f"{net}_c{j}"] = stack(f"{net}.{{i}}.c.{j}.weight", transpose=True)
                d[f"{net}_cb{j}"] = stack(f"{net}.{{i}}.c.{j}.bias")
            else:
                d[f"{net}_c{j}"] = None
                d[f"{net}_cb{j}"] = None
    return RealNVPParams(
        masks=d["masks"],
        s_w0=d["s_w0"], s_b0=d["s_b0"], s_w1=d["s_w1"], s_b1=d["s_b1"],
        s_w2=d["s_w2"], s_b2=d["s_b2"],
        t_w0=d["t_w0"], t_b0=d["t_b0"], t_w1=d["t_w1"], t_b1=d["t_b1"],
        t_w2=d["t_w2"], t_b2=d["t_b2"],
        s_c0=d["s_c0"], s_cb0=d["s_cb0"], s_c1=d["s_c1"], s_cb1=d["s_cb1"],
        t_c0=d["t_c0"], t_cb0=d["t_cb0"], t_c1=d["t_c1"], t_cb1=d["t_cb1"],
        kemb_w0=None, kemb_b0=None, kemb_w1=None, kemb_b1=None,
        part_ws=(), part_bs=(),
    )


def convert_det_head(sd: dict, prefix: str) -> dict:
    return {
        "l0": convert_linear(sd, prefix + "0"),
        "l1": convert_linear(sd, prefix + "2"),
    }


def load_torch_checkpoint(path: str, model_cfg) -> dict:
    """Load ent_ho3d-style .pth into a params dict for models/mhent.

    Returns params with 'encoder', 'flow', 'det_head' (and '_batch_stats').
    Missing modules are skipped with a warning (matching the reference's
    shape-tolerant load, CrossModalHand.py:589-602).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu")
    params: dict = {}
    enc_sd = ckpt.get("encoderRGB")
    if enc_sd is None:
        print(f"WARNING: {path} has no 'encoderRGB' module "
              f"(keys: {sorted(ckpt)[:6]}) — nothing converted",
              file=sys.stderr)
        return params
    bb_params, bb_stats = convert_resnet(enc_sd, "feat_extractor.res.")
    encoder = {"backbone": bb_params}
    for head, ours in (("l1", "l1"), ("l2", "l2")):
        key = f"feat_extractor.{head}.0"
        if f"{key}.weight" in enc_sd:
            encoder[ours] = convert_linear(enc_sd, key)
    params["encoder"] = encoder
    params["_batch_stats"] = bb_stats
    if "det_head.0.weight" in enc_sd:
        params["det_head"] = convert_det_head(enc_sd, "det_head.")
    if "q_z_giv_i.mask" in enc_sd:
        n_layers = model_cfg.flow.n_layers
        params["flow"] = convert_realnvp(enc_sd, "q_z_giv_i.", n_layers)
    elif "q_z_giv_i._transform._transforms.0.log_scale" in enc_sd:
        # regressor: glow (network.py:343-344, the nflows-fork ConditionalGlow)
        params["flow"] = convert_conditional_glow(enc_sd, "q_z_giv_i.")
    return params


def main():
    src, dst = sys.argv[1], sys.argv[2]
    from mhentropy_tpu.models.mhent import MHEntConfig

    params = load_torch_checkpoint(src, MHEntConfig())
    if not params:
        print(f"ERROR: no convertible modules found in {src}", file=sys.stderr)
        return 1
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as saver:
        saver.save(dst, params, force=True)
    print(f"converted {src} -> {dst}")
    return 0


def load_rle_checkpoint(path: str, model_cfg) -> dict:
    """Load a non-integrated BasicEnc + p_nf checkpoint (the RLE mode;
    state_dict keys 'encoderRGB' = BasicEnc, 'p_nf' = RealNVP,
    CrossModalHand.py:573-587)."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    params: dict = {}
    enc_sd = ckpt.get("encoderRGB")
    if enc_sd is not None:
        bb_params, bb_stats = convert_resnet(enc_sd, "res.")
        encoder = {"backbone": bb_params}
        for head in ("l1", "l2"):
            key = f"{head}.0"
            if f"{key}.weight" in enc_sd:
                encoder[head] = convert_linear(enc_sd, key)
        params["encoder"] = encoder
        params["_batch_stats"] = bb_stats
    nf_sd = ckpt.get("p_nf")
    if nf_sd is not None and "mask" in nf_sd:
        params["p_nf"] = convert_realnvp(nf_sd, "", model_cfg.flow.n_layers)
    return params


def convert_conditional_glow(sd: dict, prefix: str = "") -> list:
    """nkolot/nflows ConditionalGlow state_dict -> flows.glow params (list of
    per-step {actnorm, linear, coupling} dicts).

    The fork's schema: `{prefix}_transform._transforms.{j}.*` where steps
    repeat (ActNorm: log_scale/shift; LULinear: bias/lower_entries/
    upper_entries/unconstrained_upper_diag; AffineCoupling:
    transform_net.{initial_layer,blocks.{k}.{context_layer,linear_layers.
    {0,1},batch_norm_layers.{0,1}},final_layer}). Transforms are classified
    by parameter names, not fixed positions, so extra permutation transforms
    or variant orderings fail loudly instead of mapping wrongly.
    """
    import jax.numpy as jnp

    pat = re.compile(
        re.escape(prefix) + r"_transform\._transforms\.(\d+)\.(.*)"
    )
    groups: dict = {}
    for k, v in sd.items():
        m = pat.match(k)
        if m:
            groups.setdefault(int(m.group(1)), {})[m.group(2)] = _np(v)
    if not groups:
        raise ValueError(
            f"no ConditionalGlow tensors under prefix {prefix!r}; keys look "
            f"like {sorted(sd)[:3]}"
        )

    layers = []
    cur: dict = {}
    for j in sorted(groups):
        g = groups[j]
        if "log_scale" in g:  # ActNorm
            if cur:
                raise ValueError(f"unexpected transform order at index {j}")
            cur = {"actnorm": {
                "log_scale": jnp.asarray(g["log_scale"]),
                "shift": jnp.asarray(g["shift"]),
            }}
        elif "lower_entries" in g:  # LULinear
            cur["linear"] = {
                "lower_entries": jnp.asarray(g["lower_entries"]),
                "upper_entries": jnp.asarray(g["upper_entries"]),
                "unconstrained_upper_diag": jnp.asarray(
                    g["unconstrained_upper_diag"]
                ),
                "bias": jnp.asarray(g["bias"]),
            }
        elif any(k.startswith("transform_net.") for k in g):  # coupling
            def lin(name):
                return {
                    "w": jnp.asarray(g[f"transform_net.{name}.weight"].T),
                    "b": jnp.asarray(g[f"transform_net.{name}.bias"]),
                }

            n_blocks = 1 + max(
                int(m.group(1))
                for k in g
                if (m := re.match(r"transform_net\.blocks\.(\d+)\.", k))
            )
            blocks = []
            for k_blk in range(n_blocks):
                p = f"blocks.{k_blk}"
                blk = {
                    "l0": lin(f"{p}.linear_layers.0"),
                    "l1": lin(f"{p}.linear_layers.1"),
                    "ctx": lin(f"{p}.context_layer"),
                }
                bn_key = f"transform_net.{p}.batch_norm_layers.0.weight"
                if bn_key in g:
                    for b_i in (0, 1):
                        q = f"transform_net.{p}.batch_norm_layers.{b_i}"
                        blk[f"bn{b_i}"] = {
                            "scale": jnp.asarray(g[f"{q}.weight"]),
                            "bias": jnp.asarray(g[f"{q}.bias"]),
                            "mean": jnp.asarray(g[f"{q}.running_mean"]),
                            "var": jnp.asarray(g[f"{q}.running_var"]),
                        }
                blocks.append(blk)
            cur["coupling"] = {
                "initial": lin("initial_layer"),
                "blocks": blocks,
                "final": lin("final_layer"),
            }
            if set(cur) != {"actnorm", "linear", "coupling"}:
                raise ValueError(
                    f"incomplete glow step ending at transform {j}: {set(cur)}"
                )
            layers.append(cur)
            cur = {}
        else:
            raise ValueError(
                f"unrecognised transform at index {j}: params {sorted(g)[:4]}"
            )
    if cur:
        raise ValueError(f"trailing partial glow step: {set(cur)}")
    return layers


def load_prohmr_smpl_flow(path: str, glow_cfg=None) -> list:
    """Load the reference's released ProHMR-style SMPL-flow weights
    (/root/reference/README.md:26-42) into flows.glow params (BASELINE
    config 5). Auto-detects the ConditionalGlow key prefix (ProHMR stores it
    as `flow.`; standalone dumps use '').

    glow_cfg: optional flows.glow.GlowConfig to validate the converted
    geometry against — a mismatched checkpoint fails HERE with the two
    configs printed, not with a shape error deep inside sampling."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    marker = "_transform._transforms.0.log_scale"
    prefixes = sorted({k[: -len(marker)] for k in sd if k.endswith(marker)})
    if not prefixes:
        raise ValueError(
            f"{path}: no ConditionalGlow found; keys like {sorted(sd)[:5]}"
        )
    params = convert_conditional_glow(sd, prefixes[0])
    if glow_cfg is not None:
        from mhentropy_tpu.flows.glow import infer_config

        got = infer_config(params)
        want = glow_cfg._replace(dropout=got.dropout)  # not in the weights
        if got != want:
            raise ValueError(
                f"{path}: checkpoint geometry {got} does not match the "
                f"configured flow {want}"
            )
    return params


if __name__ == "__main__":
    # At the END of the module: a mid-file guard ran main() before
    # convert_conditional_glow was defined (NameError on glow ckpts).
    sys.exit(main())
