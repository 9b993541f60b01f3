"""Training diagnostics — the functional rebuild of the reference's ModelDebugger
(utils/debugging.py:12-698: forward/backward hook recorder, grad-norm history,
student-teacher similarity, dead-neuron checks, weight distributions, center-update
tracking, comprehensive report).

Torch hooks don't exist in JAX; the equivalents are:
- activation capture via flax ``capture_intermediates`` (pure, no hooks),
- per-layer gradient norms straight off the grad pytree,
- numeric sanitizers (NaN/inf guards) as first-class logged scalars — the framework's
  stand-in for the reference's absent race/sanitizer tooling (SURVEY.md §5).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def tree_finite(tree) -> bool:
    """True iff every float leaf is finite (loss/grad NaN guard)."""
    leaves = [jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(tree)
              if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)]
    return bool(jax.device_get(jnp.all(jnp.stack(leaves)))) if leaves else True


def gradient_norms(grads) -> Dict[str, float]:
    """Per-top-level-subtree L2 norms + global norm (grad-flow analysis,
    reference debugging.py:245-335)."""
    out = {}
    if isinstance(grads, dict):
        for k, sub in grads.items():
            leaves = [jnp.sum(x.astype(jnp.float32) ** 2) for x in jax.tree.leaves(sub)]
            out[k] = float(jax.device_get(jnp.sqrt(sum(leaves)))) if leaves else 0.0
    total = [jnp.sum(x.astype(jnp.float32) ** 2) for x in jax.tree.leaves(grads)]
    out["__global__"] = float(jax.device_get(jnp.sqrt(sum(total)))) if total else 0.0
    return out


def activation_stats(module, variables, *inputs, **kwargs) -> Dict[str, Dict[str, float]]:
    """Per-layer activation statistics via capture_intermediates (hook analog):
    mean/std/|max| and dead fraction (exact zeros, the post-ReLU dead-neuron check,
    reference debugging.py:375-447)."""
    _, state = module.apply(variables, *inputs, capture_intermediates=True,
                            mutable=["intermediates"], **kwargs)
    flat = {}

    def walk(tree, prefix):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        else:
            for arr in (tree if isinstance(tree, tuple) else (tree,)):
                if hasattr(arr, "dtype") and jnp.issubdtype(arr.dtype, jnp.floating):
                    a = np.asarray(jax.device_get(arr))
                    flat[prefix] = {
                        "mean": float(a.mean()),
                        "std": float(a.std()),
                        "absmax": float(np.abs(a).max()),
                        "dead_frac": float((a == 0).mean()),
                    }

    walk(state["intermediates"], "")
    return flat


def weight_stats(params) -> Dict[str, Dict[str, float]]:
    """Weight distribution summary (reference debugging.py:337-373)."""
    out = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        a = np.asarray(jax.device_get(leaf))
        out[name] = {"mean": float(a.mean()), "std": float(a.std()),
                     "absmax": float(np.abs(a).max()), "size": int(a.size)}
    return out


def student_teacher_kl(student_logits, teacher_logits,
                       student_temp: float = 0.1, teacher_temp: float = 0.04) -> float:
    """KL(teacher || student) over projection distributions — the collapse analysis
    from the reference's analyze_model.ipynb (entropy + KL between student/teacher
    projections; SURVEY.md §4 sanity-check notebooks)."""
    t = jax.nn.softmax(teacher_logits / teacher_temp, axis=-1)
    s = jax.nn.log_softmax(student_logits / student_temp, axis=-1)
    n = min(t.shape[0], s.shape[0])
    kl = jnp.sum(t[:n] * (jnp.log(t[:n] + 1e-10) - s[:n]), axis=-1)
    return float(jax.device_get(jnp.mean(kl)))


def student_teacher_similarity(student_projs, teacher_projs) -> float:
    """Mean cosine similarity between matched student/teacher projections
    (collapse detector, reference debugging.py:166-243)."""
    s = student_projs / (jnp.linalg.norm(student_projs, axis=-1, keepdims=True) + 1e-12)
    t = teacher_projs / (jnp.linalg.norm(teacher_projs, axis=-1, keepdims=True) + 1e-12)
    n = min(s.shape[0], t.shape[0])
    return float(jax.device_get(jnp.mean(jnp.sum(s[:n] * t[:n], axis=-1))))


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_gradient_flow(grad_norm_history: List[Dict[str, float]],
                       out_dir: str, name: str = "gradient_flow.png") -> Optional[str]:
    """Bar chart of average per-subtree gradient norms over training — the
    reference's grad-flow visualization (debugging.py:245-277)."""
    try:
        plt = _plt()
    except Exception:  # pragma: no cover
        return None
    if not grad_norm_history:
        return None
    keys = [k for k in grad_norm_history[-1] if k != "__global__"]
    if not keys:
        return None
    avgs = [float(np.mean([h.get(k, 0.0) for h in grad_norm_history])) for k in keys]
    os.makedirs(out_dir, exist_ok=True)
    fig, ax = plt.subplots(figsize=(max(6, 0.8 * len(keys)), 5))
    ax.bar(range(len(keys)), avgs)
    ax.set_xticks(range(len(keys)), keys, rotation=90)
    ax.set_ylabel("average gradient norm")
    ax.set_title("Gradient flow")
    ax.grid(True, axis="y")
    path = os.path.join(out_dir, name)
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_feature_maps(module, variables, *inputs, out_dir: str,
                      layer_filter: str = "", max_channels: int = 16,
                      name: str = "feature_maps.png", **apply_kwargs) -> Optional[str]:
    """Grid of feature-map channels from the first (or filtered) 4-D intermediate
    activation, sample 0 — reference visualize_feature_maps (debugging.py:188-243),
    via capture_intermediates instead of forward hooks."""
    try:
        plt = _plt()
    except Exception:  # pragma: no cover
        return None
    _, state = module.apply(variables, *inputs, capture_intermediates=True,
                            mutable=["intermediates"], **apply_kwargs)
    found_name, fmap = None, None

    def walk(tree, prefix):
        nonlocal found_name, fmap
        if fmap is not None:
            return
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        else:
            for arr in (tree if isinstance(tree, tuple) else (tree,)):
                if (hasattr(arr, "ndim") and arr.ndim == 4
                        and layer_filter in prefix):
                    found_name, fmap = prefix, np.asarray(jax.device_get(arr))
                    return

    walk(state["intermediates"], "")
    if fmap is None:
        return None
    chans = min(max_channels, fmap.shape[-1])  # NHWC
    cols = int(np.ceil(np.sqrt(chans)))
    rows = int(np.ceil(chans / cols))
    os.makedirs(out_dir, exist_ok=True)
    fig, axes = plt.subplots(rows, cols, figsize=(2 * cols, 2 * rows))
    axes = np.atleast_1d(axes).ravel()
    for c in range(chans):
        axes[c].imshow(fmap[0, :, :, c], cmap="viridis")
        axes[c].set_title(f"ch {c}", fontsize=7)
    for ax in axes:
        ax.axis("off")
    fig.suptitle(f"Feature maps: {found_name}", fontsize=9)
    path = os.path.join(out_dir, name)
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_embeddings_tsne(student_projs, teacher_projs, out_dir: str,
                         name: str = "embeddings_tsne.png",
                         random_seed: int = 42) -> Optional[str]:
    """t-SNE scatter of student vs teacher projection embeddings — collapse shows
    as the two clouds coinciding (reference debugging.py:279-335)."""
    try:
        from sklearn.manifold import TSNE

        plt = _plt()
    except Exception:  # pragma: no cover
        return None
    s = np.asarray(jax.device_get(student_projs))
    t = np.asarray(jax.device_get(teacher_projs))
    combined = np.vstack([s, t])
    if len(combined) < 8:
        return None
    perplexity = min(30.0, (len(combined) - 1) / 3)
    emb = TSNE(n_components=2, random_state=random_seed,
               perplexity=perplexity).fit_transform(combined)
    os.makedirs(out_dir, exist_ok=True)
    fig, ax = plt.subplots(figsize=(8, 6))
    ax.scatter(emb[: len(s), 0], emb[: len(s), 1], c="tab:blue", alpha=0.7,
               label="student")
    ax.scatter(emb[len(s):, 0], emb[len(s):, 1], c="tab:red", alpha=0.7,
               label="teacher")
    ax.legend()
    ax.set_title("t-SNE of projection embeddings")
    path = os.path.join(out_dir, name)
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_weight_distributions(params, out_dir: str,
                              name: str = "weight_distributions.png",
                              max_layers: int = 12) -> Optional[str]:
    """Histogram grid of the largest weight tensors (debugging.py:337-373)."""
    try:
        plt = _plt()
    except Exception:  # pragma: no cover
        return None
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    named = sorted(((("/".join(str(getattr(p, "key", p)) for p in path)), leaf)
                    for path, leaf in flat), key=lambda kv: -np.size(kv[1]))[:max_layers]
    if not named:
        return None
    cols = 3
    rows = int(np.ceil(len(named) / cols))
    os.makedirs(out_dir, exist_ok=True)
    fig, axes = plt.subplots(rows, cols, figsize=(4 * cols, 2.5 * rows))
    axes = np.atleast_1d(axes).ravel()
    for ax, (nm, leaf) in zip(axes, named):
        a = np.asarray(jax.device_get(leaf)).ravel()
        ax.hist(a, bins=50)
        ax.set_title(nm, fontsize=7)
    for ax in axes[len(named):]:
        ax.axis("off")
    fig.tight_layout()
    path = os.path.join(out_dir, name)
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return path


@dataclasses.dataclass
class DiagnosticsRecorder:
    """Accumulates per-step diagnostics and writes a comprehensive report
    (reference debugging.py generate_comprehensive_report)."""

    grad_norm_history: List[Dict[str, float]] = dataclasses.field(default_factory=list)
    center_history: List[float] = dataclasses.field(default_factory=list)
    similarity_history: List[float] = dataclasses.field(default_factory=list)
    loss_history: List[float] = dataclasses.field(default_factory=list)
    nonfinite_steps: List[int] = dataclasses.field(default_factory=list)

    def record_step(self, step: int, loss: float, grads=None, center=None,
                    similarity: Optional[float] = None) -> None:
        self.loss_history.append(float(loss))
        if not np.isfinite(loss):
            self.nonfinite_steps.append(step)
        if grads is not None:
            self.grad_norm_history.append(gradient_norms(grads))
        if center is not None:
            self.center_history.append(
                float(jax.device_get(jnp.linalg.norm(center))))
        if similarity is not None:
            self.similarity_history.append(similarity)

    def _history_figures(self, out_dir: str) -> List[str]:
        """Loss / grad-norm / similarity / center-norm curves as PNGs (the reference's
        plot_loss_curve :116, plot_gradient_norms :134, plot_student_teacher_similarity
        :166, track_center_updates :392)."""
        try:
            plt = _plt()
        except Exception:  # pragma: no cover
            return []
        os.makedirs(out_dir, exist_ok=True)
        paths = []

        def curve(ys, title, fname, ylabel):
            fig, ax = plt.subplots(figsize=(7, 4))
            ax.plot(ys)
            ax.set_xlabel("step")
            ax.set_ylabel(ylabel)
            ax.set_title(title)
            ax.grid(True)
            p = os.path.join(out_dir, fname)
            fig.savefig(p, dpi=100, bbox_inches="tight")
            plt.close(fig)
            paths.append(p)

        if self.loss_history:
            curve(self.loss_history, "Loss curve", "loss_curve.png", "loss")
        if self.grad_norm_history:
            fig, ax = plt.subplots(figsize=(7, 4))
            keys = list(self.grad_norm_history[-1])
            for k in keys:
                ax.plot([h.get(k, np.nan) for h in self.grad_norm_history], label=k)
            ax.set_xlabel("step")
            ax.set_ylabel("grad norm")
            ax.set_yscale("log")
            ax.legend(fontsize=7)
            ax.set_title("Gradient norms")
            p = os.path.join(out_dir, "gradient_norms.png")
            fig.savefig(p, dpi=100, bbox_inches="tight")
            plt.close(fig)
            paths.append(p)
            gp = plot_gradient_flow(self.grad_norm_history, out_dir)
            if gp:
                paths.append(gp)
        if self.similarity_history:
            curve(self.similarity_history, "Student-teacher cosine similarity",
                  "student_teacher_similarity.png", "cosine")
        if self.center_history:
            curve(self.center_history, "Center norm", "center_updates.png", "||center||")
        return paths

    def report(self, out_dir: Optional[str] = None, params=None) -> str:
        """Text report; with ``out_dir`` also writes the figure bundle + report.html
        (the reference's generate_comprehensive_report, debugging.py:521-650)."""
        lines = ["=== Diagnostics report ==="]
        if self.loss_history:
            arr = np.asarray(self.loss_history)
            lines.append(f"loss: first={arr[0]:.4f} last={arr[-1]:.4f} "
                         f"min={np.nanmin(arr):.4f}")
        if self.nonfinite_steps:
            lines.append(f"NON-FINITE LOSS at steps: {self.nonfinite_steps}")
        if self.grad_norm_history:
            last = self.grad_norm_history[-1]
            lines.append("grad norms (last step): "
                         + ", ".join(f"{k}={v:.3e}" for k, v in last.items()))
            if last["__global__"] == 0.0:
                lines.append("WARNING: zero global gradient norm (dead graph?)")
        if self.center_history:
            lines.append(f"center ||c||: {self.center_history[0]:.4f} -> "
                         f"{self.center_history[-1]:.4f}")
        if self.similarity_history:
            s = self.similarity_history[-1]
            lines.append(f"student-teacher cosine: {s:.4f}"
                         + ("  (collapse suspected)" if s > 0.999 else ""))
        text = "\n".join(lines)
        if out_dir is not None:
            os.makedirs(out_dir, exist_ok=True)
            figures = self._history_figures(out_dir)
            if params is not None:
                wp = plot_weight_distributions(params, out_dir)
                if wp:
                    figures.append(wp)
            with open(os.path.join(out_dir, "report.txt"), "w") as f:
                f.write(text + "\n")
            def _section(p):
                base = os.path.basename(p)
                title = os.path.splitext(base)[0].replace("_", " ").title()
                return (f'<div class="section"><h2>{title}</h2>'
                        f'<img src="{base}" alt="{base}"></div>')

            sections = "\n".join(_section(p) for p in figures)
            html = ("<html><head><style>img{max-width:100%;border:1px solid #ddd}"
                    "</style></head><body><h1>Model Debug Report</h1>"
                    f"<pre>{text}</pre>{sections}</body></html>")
            with open(os.path.join(out_dir, "report.html"), "w") as f:
                f.write(html)
        return text
