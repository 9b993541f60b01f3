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

    def report(self) -> str:
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
        return "\n".join(lines)
