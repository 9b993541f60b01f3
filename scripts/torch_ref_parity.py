"""Numeric A/B harness: reference torch dual-ViT DINO vs avmnist_tpu (diagnostic).

VERDICT r2 Weak #1 bisection tool. Imports the REFERENCE's own torch modules from
/root/reference at runtime (read-only; no code is copied into this repo), transplants
the torch model's initial weights into our flax DINONet, feeds IDENTICAL
pre-generated multi-crop views to both, and compares:

    --mode grads   one eval-mode step: loss + per-parameter-group gradient rel-diff
    --mode train   N-epoch training A/B on an identical stream of views
                   (both sides: Adam lr 1e-4 wd 1e-6, EMA teacher m=0.996,
                   center update cm=0.9, dino loss temps 0.1/0.04) with a per-epoch
                   kNN probe on student-encoder features.

If grads match but training diverges, the defect is in the update rule; if torch
ALSO fails to learn on this corpus, the reference itself does not converge under
these conditions and the parity gap is data-, not implementation-, driven.

Run on CPU: JAX_PLATFORMS=cpu python scripts/torch_ref_parity.py --mode grads
"""
from __future__ import annotations

import argparse
import importlib.machinery
import importlib.util
import json
import sys
import types

import numpy as np


# ---------------------------------------------------------------- ref import
def import_reference_dino():
    """Import /root/reference/.../models/dino.py with unavailable deps stubbed."""
    ref_root = "/root/reference/AVMNIST_Experiments"

    def stub(name, **attrs):
        m = types.ModuleType(name)
        # torch._dynamo.trace_rules calls importlib.util.find_spec on installed
        # modules (e.g. tqdm) and raises if __spec__ is None — give stubs a spec
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    class _LightningModule:  # minimal base for class definitions
        def __init__(self, *a, **kw):
            pass

        def save_hyperparameters(self, *a, **kw):
            pass

        def log(self, *a, **kw):
            pass

    lightning = stub("lightning")
    stub("lightning.pytorch", LightningModule=_LightningModule,
         seed_everything=lambda *a, **kw: None)
    lightning.pytorch = sys.modules["lightning.pytorch"]
    stub("torchvision")
    stub("torchvision.models")
    stub("torchvision.models.mobilenetv3", mobilenet_v3_small=lambda **kw: None)
    stub("torchvision.models.resnet", resnet18=lambda **kw: None)
    stub("tqdm", tqdm=lambda x, **kw: x)
    class _Accuracy:
        def __init__(self, *a, **kw):
            pass
    stub("torchmetrics")
    stub("torchmetrics.classification", Accuracy=_Accuracy)
    stub("utils", )
    stub("utils.get_data", AVMNISTDataModule=object,
         get_dataloader_augmented=lambda *a, **kw: None)

    sys.path.insert(0, ref_root)
    # models.unimodal + models.dino_vit are pure torch; import dino via package.
    import models.dino as ref_dino  # noqa: E402
    return ref_dino


# ------------------------------------------------------------- weight bridge
def torch_to_flax(ref_model, cfg):
    """Map reference MultiModalDINO state_dict -> our DINONet param/stat trees.

    Returns (params, batch_stats, teacher_params, teacher_batch_stats) as nested
    dicts matching avmnist_tpu.objectives.dino.DINONet(multi_dual_vit)."""
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    def lin(prefix):
        return {"kernel": sd[prefix + ".weight"].T, "bias": sd[prefix + ".bias"]}

    def vit(prefix):
        """reference ViTEncoder -> our ViTEncoder param subtree."""
        p = {
            "PatchEmbedding_0": {"Conv_0": {
                # torch conv (out,in,kh,kw) -> flax (kh,kw,in,out)
                "kernel": sd[f"{prefix}.patch_embed.projection.weight"].transpose(2, 3, 1, 0),
                "bias": sd[f"{prefix}.patch_embed.projection.bias"],
            }},
            "cls_token": sd[f"{prefix}.cls_token"],
            "pos_embed": sd[f"{prefix}.pos_embed"],
        }
        enc = {}
        depth = 0
        while f"{prefix}.transformer.layers.{depth}.norm1.weight" in sd:
            lp = f"{prefix}.transformer.layers.{depth}"
            enc[f"TransformerEncoderLayer_{depth}"] = {
                "SelfAttention_0": {
                    "Dense_0": {  # packed qkv: torch in_proj (3d,d) -> (d,3d)
                        "kernel": sd[f"{lp}.self_attn.in_proj_weight"].T,
                        "bias": sd[f"{lp}.self_attn.in_proj_bias"],
                    },
                    "Dense_1": lin(f"{lp}.self_attn.out_proj"),
                },
                "LayerNorm_0": {"scale": sd[f"{lp}.norm1.weight"],
                                "bias": sd[f"{lp}.norm1.bias"]},
                "Dense_0": lin(f"{lp}.linear1"),
                "Dense_1": lin(f"{lp}.linear2"),
                "LayerNorm_1": {"scale": sd[f"{lp}.norm2.weight"],
                                "bias": sd[f"{lp}.norm2.bias"]},
            }
            depth += 1
        enc["LayerNorm_0"] = {"scale": sd[f"{prefix}.transformer.norm.weight"],
                              "bias": sd[f"{prefix}.transformer.norm.bias"]}
        p["TransformerEncoder_0"] = enc
        return p

    def encoder(tp):  # tp in ("student", "teacher")
        return {
            "image_encoder": vit(f"{tp}.image_encoder"),
            "audio_encoder": vit(f"{tp}.audio_encoder"),
            # DualViTFusion creates the OUTER Dense first (flax nn.compact names
            # follow constructor order), so Dense_0 = 512->out, Dense_1 = 2E->512
            "fusion": {"Dense_0": lin(f"{tp}.fusion.2"),
                       "Dense_1": lin(f"{tp}.fusion.0")},
            "gate_image": sd[f"{tp}.gate_image"],
            "gate_audio": sd[f"{tp}.gate_audio"],
        }

    def projection(tp):
        # reference ProjectionHead: Linear -> BatchNorm1d -> GELU -> Dropout -> Linear
        pr = {"Dense_0": lin(f"{tp}.mlp.0"), "Dense_1": lin(f"{tp}.mlp.4"),
              "BatchNorm_0": {"scale": sd[f"{tp}.mlp.1.weight"],
                              "bias": sd[f"{tp}.mlp.1.bias"]}}
        st = {"BatchNorm_0": {"mean": sd[f"{tp}.mlp.1.running_mean"],
                              "var": sd[f"{tp}.mlp.1.running_var"]}}
        return pr, st

    sp, sps = projection("student_projection")
    tp_, tps = projection("teacher_projection")
    params = {"encoder": encoder("student"), "projection": sp}
    stats = {"projection": sps}
    t_params = {"encoder": encoder("teacher"), "projection": tp_}
    t_stats = {"projection": tps}
    return params, stats, t_params, t_stats


def to_f32_tree(tree):
    import jax

    return jax.tree.map(lambda x: np.asarray(x, np.float32), tree)


# ------------------------------------------------------------------ views
def make_view_batch(split, idx, augment, key):
    """Generate one multi-crop view batch with OUR augment bank; return numpy
    NHWC views for jax and NCHW for torch."""
    import jax
    import jax.numpy as jnp

    from avmnist_tpu.objectives.common import normalize_audio, normalize_images

    batch = split.gather(idx)
    images = normalize_images(jnp.asarray(batch["image"]))
    audios = normalize_audio(jnp.asarray(batch["audio"]))
    gi, ga, li, la = augment(images[..., 0], audios[..., 0], key)
    views = {k: np.asarray(v) for k, v in
             {"gi": gi, "ga": ga, "li": li, "la": la}.items()}
    labels = np.asarray(batch["label"])
    return views, labels


def fold_np(v):  # (B, n, H, W, 1) -> (n*B, H, W, 1) view-major
    b, n = v.shape[:2]
    return np.ascontiguousarray(v.swapaxes(0, 1).reshape(n * b, *v.shape[2:]))


def torch_views(views):
    import torch

    def t(v):  # (B,n,H,W,1) -> (B,n,1,H,W)
        return torch.from_numpy(np.ascontiguousarray(
            v[..., 0][:, :, None, :, :])).float()

    return t(views["gi"]), t(views["ga"]), t(views["li"]), t(views["la"])


# ------------------------------------------------------------------- losses
def torch_dino_loss(student_outputs, teacher_outputs, ts=0.1, tt=0.04):
    """Reference dino_loss math (models/dino.py:822-854), restated."""
    import torch
    import torch.nn.functional as F

    s = F.normalize(student_outputs, p=2, dim=-1)
    t = F.normalize(teacher_outputs, p=2, dim=-1)
    tp = F.softmax(t / tt, dim=-1)
    slp = F.log_softmax(s / ts, dim=-1)
    total = 0
    for i in range(s.shape[0]):
        for j in range(t.shape[0]):
            total = total + (-(tp[j] * slp[i]).sum(dim=-1).mean())
    return total / (s.shape[0] * t.shape[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["grads", "train"], default="grads")
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--n_train", type=int, default=1600)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--encoder_output_dim", type=int, default=128)
    ap.add_argument("--output_dim", type=int, default=256)
    ap.add_argument("--projection_dim", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--config", default="configs/config_parity_synth.yaml")
    ap.add_argument("--side", choices=["both", "torch", "jax"], default="both",
                    help="train mode: which implementation(s) to run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import torch

    from avmnist_tpu.config.schema import load_config
    from avmnist_tpu.data.datasets import DataSplit
    from avmnist_tpu.objectives.dino import (DinoConfig, dino_loss_fn,
                                             make_dino_objective)
    from avmnist_tpu.train.experiment import load_experiment_data

    ref = import_reference_dino()
    torch.manual_seed(0)
    ref_model = ref.MultiModalDINO(
        encoder_class=ref.DualViTMultiModalEncoder,
        output_dim=args.output_dim, encoder_output_dim=args.encoder_output_dim,
        projection_dim=args.projection_dim, momentum=0.996, center_momentum=0.9,
        dropout=0.3)

    cfg = DinoConfig(model_name="multi_dual_vit",
                     encoder_output_dim=args.encoder_output_dim,
                     output_dim=args.output_dim, projection_dim=args.projection_dim,
                     learning_rate=args.lr, compute_dtype=jnp.float32,
                     num_epochs=args.epochs)
    obj = make_dino_objective(cfg)
    student, teacher = obj.meta["student"], obj.meta["teacher"]
    augment = obj.meta["augment"]

    state = obj.init_fn(jax.random.key(0))
    params, stats, t_params, t_stats = (to_f32_tree(t) for t in
                                        torch_to_flax(ref_model, cfg))
    # shape check against our own init
    ours = jax.tree.map(np.shape, jax.device_get(state.params))
    theirs = jax.tree.map(np.shape, params)
    assert ours == theirs, (
        "param tree mismatch:\n"
        + json.dumps({"ours": str(ours), "theirs": str(theirs)})[:4000])
    state = state.replace(params=jax.tree.map(jnp.asarray, params),
                          batch_stats=jax.tree.map(jnp.asarray, stats),
                          teacher_params=jax.tree.map(jnp.asarray, t_params),
                          teacher_batch_stats=jax.tree.map(jnp.asarray, t_stats))

    config = load_config(args.config)
    train_split, val_split, _ = load_experiment_data(config)
    sub = DataSplit(train_split.arrays, train_split.indices[: args.n_train])
    vsub = DataSplit(val_split.arrays, val_split.indices[:1000])

    b = args.batch_size
    views, labels = make_view_batch(sub, np.arange(b), augment, jax.random.key(42))

    if args.mode == "grads":
        run_grad_parity(args, ref_model, ref, student, teacher, state, views)
    else:
        run_training_ab(args, ref_model, ref, obj, student, teacher, state,
                        sub, vsub, augment)


def run_grad_parity(args, ref_model, ref, student, teacher, state, views):
    import jax
    import jax.numpy as jnp
    import torch

    from avmnist_tpu.objectives.dino import dino_loss_fn

    b = args.batch_size
    ng, nl = 2, 4

    # ---- torch side (eval mode: no dropout; BN uses running stats)
    ref_model.eval()
    tv = torch_views(views)
    s_out, t_out, _ = ref_model(tv)
    loss_t = torch_dino_loss(s_out, t_out)
    loss_t.backward()
    tgrads = {k: p.grad.detach().numpy() for k, p in ref_model.named_parameters()
              if p.grad is not None}

    # ---- jax side (same math path as objectives.dino.step_fn, train=False)
    s_imgs = jnp.concatenate([fold_np(views["gi"]), fold_np(views["li"])])
    s_auds = jnp.concatenate([fold_np(views["ga"]), fold_np(views["la"])])
    t_imgs, t_auds = jnp.asarray(fold_np(views["gi"])), jnp.asarray(fold_np(views["ga"]))

    def loss_fn(params):
        sp, _ = student.apply({"params": params, "batch_stats": state.batch_stats},
                              s_imgs, s_auds, train=False)
        tp, _ = teacher.apply({"params": state.teacher_params,
                               "batch_stats": state.teacher_batch_stats},
                              t_imgs, t_auds, train=False)
        tp = jax.lax.stop_gradient(tp)
        loss, _ = dino_loss_fn(sp.reshape(ng + nl, b, -1).astype(jnp.float32),
                               tp.reshape(ng, b, -1).astype(jnp.float32),
                               0.1, 0.04, True, False)
        return loss

    loss_j, grads = jax.value_and_grad(loss_fn)(state.params)
    print(json.dumps({"loss_torch": float(loss_t), "loss_jax": float(loss_j),
                      "rel": abs(float(loss_t) - float(loss_j))
                      / max(abs(float(loss_t)), 1e-12)}))

    # map torch grads into flax layout and diff
    ref_model.zero_grad()
    from copy import deepcopy
    with torch.no_grad():
        gm = deepcopy(ref_model)
        for (k, p), g in zip(gm.named_parameters(),
                             [tgrads.get(k) for k, _ in gm.named_parameters()]):
            p.copy_(torch.from_numpy(g) if g is not None else p * 0)
    gparams, _, _, _ = torch_to_flax(gm, None)

    flat_j = jax.tree_util.tree_leaves_with_path(jax.device_get(grads["encoder"]))
    flat_t = jax.tree_util.tree_leaves_with_path(gparams["encoder"])
    rows = []
    for (pj, gj), (pt, gt) in zip(flat_j, flat_t):
        denom = max(float(np.abs(gj).max()), 1e-12)
        rows.append((float(np.abs(gj - gt).max()) / denom,
                     jax.tree_util.keystr(pj)))
    for r, k in sorted(rows, reverse=True)[:12]:
        print(json.dumps({"param": k, "max_rel_grad_diff": round(r, 6)}))


def run_training_ab(args, ref_model, ref, obj, student, teacher, state, sub,
                    vsub, augment):
    """N-epoch training on identical per-step view streams; kNN probe per epoch."""
    import jax
    import jax.numpy as jnp
    import torch

    from avmnist_tpu.objectives.dino import dino_loss_fn

    b, ng, nl = args.batch_size, 2, 4
    n_steps = args.n_train // b
    do_torch = args.side in ("both", "torch")
    do_jax = args.side in ("both", "jax")

    opt_t = torch.optim.Adam(ref_model.parameters(), lr=args.lr, weight_decay=1e-6)
    sched_t = torch.optim.lr_scheduler.CosineAnnealingLR(opt_t, T_max=args.epochs)

    import optax

    from avmnist_tpu.train.optim import torch_adam
    tx = torch_adam(args.lr, weight_decay=1e-6)  # per-epoch cosine applied below
    opt_state = tx.init(state.params)
    lr_scale = lambda e: 0.5 * (1 + np.cos(np.pi * e / args.epochs))

    @jax.jit
    def jax_step(params, t_params, stats, t_stats, center, opt_state, views, rng, lr_mult):
        s_imgs = jnp.concatenate([views["gi_f"], views["li_f"]])
        s_auds = jnp.concatenate([views["ga_f"], views["la_f"]])
        k_s, k_t = jax.random.split(rng)

        tp, t_upd = teacher.apply(
            {"params": t_params, "batch_stats": t_stats},
            views["gi_f"], views["ga_f"], train=True, rngs={"dropout": k_t},
            mutable=["batch_stats"])
        tp = jax.lax.stop_gradient(tp[0])
        t_cent = (tp - center).reshape(ng, b, -1)
        new_center = center * 0.9 + jnp.mean(tp, axis=0, keepdims=True) * 0.1

        def loss_fn(p):
            (sp, _), upd = student.apply(
                {"params": p, "batch_stats": stats}, s_imgs, s_auds, train=True,
                rngs={"dropout": k_s}, mutable=["batch_stats"])
            loss, tpr = dino_loss_fn(sp.reshape(ng + nl, b, -1), t_cent,
                                     0.1, 0.04, True, False)
            ent = -jnp.mean(jnp.sum(tpr * jnp.log(tpr + 1e-10), axis=-1))
            return loss, (upd["batch_stats"], ent)

        (loss, (new_stats, ent)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        new_t = jax.tree.map(lambda t, s: 0.996 * t + 0.004 * s, t_params,
                             {k: params[k] for k in t_params})
        updates, opt_state = tx.update(grads, opt_state, params)
        # per-epoch cosine lr: scale the UPDATE (== scaling Adam's lr), never the
        # grad (Adam normalizes grad magnitude, so grad scaling would be a no-op)
        updates = jax.tree.map(lambda u: u * lr_mult, updates)
        params = optax.apply_updates(params, updates)
        return params, new_t, new_stats, t_upd["batch_stats"], new_center, \
            opt_state, loss, ent

    params, t_params = state.params, state.teacher_params
    stats, t_stats = state.batch_stats, state.teacher_batch_stats
    center = state.center

    def knn_probe(feat_fn):
        """kNN(k=5) val accuracy from a features(images, audios)->np callable."""
        def feats(split, n):
            fs, ys = [], []
            for s in range(n // 100):
                bb = split.gather(np.arange(s * 100, (s + 1) * 100))
                fs.append(feat_fn(bb))
                ys.append(np.asarray(bb["label"]))
            return np.concatenate(fs), np.concatenate(ys)

        ftr, ytr = feats(sub, min(args.n_train, 1600))
        fva, yva = feats(vsub, 1000)
        ftr /= np.linalg.norm(ftr, axis=1, keepdims=True) + 1e-9
        fva /= np.linalg.norm(fva, axis=1, keepdims=True) + 1e-9
        sim = fva @ ftr.T
        nn_idx = np.argsort(-sim, axis=1)[:, :5]
        votes = ytr[nn_idx]
        pred = np.array([np.bincount(v, minlength=10).argmax() for v in votes])
        return 100.0 * float((pred == yva).mean())

    from avmnist_tpu.objectives.common import normalize_audio, normalize_images

    def jax_featfn(bb):
        im = jnp.asarray(normalize_images(jnp.asarray(bb["image"])))
        au = jnp.asarray(normalize_audio(jnp.asarray(bb["audio"])))
        enc = obj.meta["encoder"]
        return np.asarray(enc.apply(
            {"params": params["encoder"],
             "batch_stats": stats.get("encoder", {})}, im, au, train=False))

    def torch_featfn(bb):
        im = normalize_images(jnp.asarray(bb["image"]))
        au = normalize_audio(jnp.asarray(bb["audio"]))
        t_im = torch.from_numpy(np.ascontiguousarray(
            np.asarray(im)[..., 0][:, None])).float()
        t_au = torch.from_numpy(np.ascontiguousarray(
            np.asarray(au)[..., 0][:, None])).float()
        with torch.no_grad():
            ref_model.eval()
            out = ref_model.student(t_im, t_au).numpy()
            ref_model.train()
        return out

    rng = jax.random.key(7)
    ref_model.train()
    for epoch in range(args.epochs):
        tl, jl, jent = [], [], []
        for s in range(n_steps):
            rng, k_aug, k_step = jax.random.split(rng, 3)
            idx = np.random.RandomState(epoch * 1000 + s).permutation(
                args.n_train)[:b]
            views, _ = make_view_batch(sub, idx, augment, k_aug)

            if do_torch:
                tv = torch_views(views)
                s_out, t_out, _ = ref_model(tv)
                loss_t = torch_dino_loss(s_out, t_out)
                opt_t.zero_grad()
                loss_t.backward()
                ref_model.update_teacher()
                opt_t.step()
                tl.append(float(loss_t))

            if do_jax:
                folded = {"gi_f": jnp.asarray(fold_np(views["gi"])),
                          "ga_f": jnp.asarray(fold_np(views["ga"])),
                          "li_f": jnp.asarray(fold_np(views["li"])),
                          "la_f": jnp.asarray(fold_np(views["la"]))}
                params, t_params, stats, t_stats, center, opt_state, loss_j, ent = \
                    jax_step(params, t_params, stats, t_stats, center, opt_state,
                             folded, k_step, lr_scale(epoch))
                jl.append(float(loss_j))
                jent.append(float(ent))
        if do_torch:
            sched_t.step()

        row = {"epoch": epoch}
        if do_torch:
            row.update(loss_torch=round(float(np.mean(tl)), 4),
                       knn_torch=round(knn_probe(torch_featfn), 2))
        if do_jax:
            row.update(loss_jax=round(float(np.mean(jl)), 4),
                       teacher_entropy_jax=round(float(np.mean(jent)), 4),
                       knn_jax=round(knn_probe(jax_featfn), 2))
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
