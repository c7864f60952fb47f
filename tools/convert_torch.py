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
    return params


def main():
    src, dst = sys.argv[1], sys.argv[2]
    from mhentropy_tpu.models.mhent import MHEntConfig

    params = load_torch_checkpoint(src, MHEntConfig())
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as saver:
        saver.save(dst, params, force=True)
    print(f"converted {src} -> {dst}")


if __name__ == "__main__":
    main()


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


def load_prohmr_smpl_flow(path: str, glow_cfg) -> dict:
    """Map the reference's released ProHMR-style SMPL-flow weights into
    flows.glow.GlowParams (BASELINE config 5).

    The released .pt holds an nflows ConditionalGlow state_dict. Layer
    grouping: per step i, actnorm (log_scale/shift), LU-decomposed linear
    (recomposed to a dense matrix here), and the conditional coupling's
    residual transform net. Names vary across nflows forks; this mapper
    handles the nkolot layout and reports anything it cannot place so the
    load is never silently wrong.
    """
    import numpy as np
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    unplaced = sorted(
        k for k in sd if not any(t in k for t in (
            "actnorm", "linear", "transform_net", "_log_scale", "_shift",
        ))
    )
    if unplaced:
        import warnings

        warnings.warn(f"prohmr flow: {len(unplaced)} unmapped tensors, e.g. "
                      f"{unplaced[:5]}")
    raise NotImplementedError(
        "released ProHMR weights are not present in this environment to "
        "verify the exact nflows fork layout against; the Glow architecture "
        "(flows/glow.py) is dimension-aligned and this mapper is completed "
        "when the asset is available"
    )
