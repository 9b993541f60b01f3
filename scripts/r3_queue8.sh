#!/bin/bash
# Round-3 queue, leg 8: dual-ViT collapse diagnostics (replaces queue7's tail).
#
# Context: seed-1 100-epoch protocol run collapsed to the uniform fixed point
# (teacher entropy -> ln(128), grad_norm -> 0 by epoch 7; see PARITY.md). The
# reference's own torch modules, fed identical views in the A/B harness, track
# our loss and also fail to learn on this corpus subset. These 30-epoch
# one-knob perturbations decide between "reference recipe's own dynamics on
# this corpus" vs "implementation defect":
#   A. l2_normalize_before_softmax=False — standard raw-logit DINO geometry.
#   B. teacher_temperature=0.07          — canonical DINO value (ref: 0.04).
#   C. compute_dtype=float32             — full-f32: exonerate bf16 numerics.
#   D. base config, seed 2               — seed dependence of the collapse.
# A rescue in A/B/D => our stack trains this architecture; the collapse is the
# recipe+corpus fixed point. A rescue in C alone => numerics defect (act on it).
# Idempotent via done-markers. Logs: /tmp/r3h_*.log.
set -u
cd /root/repo

Q=/tmp/r3h_queue.log
log() { echo "[queue8 $(date +%H:%M:%S)] $*" >> "$Q"; }

if [ -f /tmp/r3f_s1.pid ]; then
  log "waiting on dualvit seed1 pid $(cat /tmp/r3f_s1.pid)"
  while kill -0 "$(cat /tmp/r3f_s1.pid)" 2>/dev/null; do sleep 30; done
  log "seed1 done"
fi

run_job() { # name bound_s cmd...
  local name=$1 bound=$2; shift 2
  local marker=/tmp/r3h_done_$name
  if [ -f "$marker" ]; then log "skip $name (done)"; return 0; fi
  log "start $name: $*"
  timeout "$bound" "$@" > "/tmp/r3h_${name}.log" 2>&1
  local rc=$?
  log "end $name rc=$rc"
  [ $rc -eq 0 ] && touch "$marker"
  return $rc
}

python - <<'EOF'
import yaml

def variant(path, **hp_overrides):
    cfg = yaml.safe_load(open('configs/config_parity_synth.yaml'))
    rf = hp_overrides.pop('_rf', None)
    if rf:
        cfg['reference_faithful'] = dict(cfg.get('reference_faithful') or {}, **rf)
    cfg['hyperparameters'].update(hp_overrides)
    yaml.safe_dump(cfg, open(path, 'w'))

variant('/tmp/diag_no_l2norm.yaml', _rf={'l2_normalize_before_softmax': False})
variant('/tmp/diag_tt007.yaml', teacher_temperature=0.07)
variant('/tmp/diag_f32.yaml', compute_dtype='float32')
EOF

run_job diag_no_l2norm 5400 \
  env AVMNIST_MAX_SCAN_STEPS=64 AVMNIST_RUN_NAME=dualvit_diag_no_l2norm \
  python -u run_dino.py --model multi_dual_vit --config /tmp/diag_no_l2norm.yaml \
    --metric mlp_acc --training_mode default --seeds 1 --epochs 30

run_job diag_tt007 5400 \
  env AVMNIST_MAX_SCAN_STEPS=64 AVMNIST_RUN_NAME=dualvit_diag_tt007 \
  python -u run_dino.py --model multi_dual_vit --config /tmp/diag_tt007.yaml \
    --metric mlp_acc --training_mode default --seeds 1 --epochs 30

run_job diag_f32 7200 \
  env AVMNIST_MAX_SCAN_STEPS=64 AVMNIST_RUN_NAME=dualvit_diag_f32 \
  python -u run_dino.py --model multi_dual_vit --config /tmp/diag_f32.yaml \
    --metric mlp_acc --training_mode default --seeds 1 --epochs 30

run_job diag_seed2 5400 \
  env AVMNIST_MAX_SCAN_STEPS=64 AVMNIST_RUN_NAME=dualvit_diag_seed2 \
  python -u run_dino.py --model multi_dual_vit --config configs/config_parity_synth.yaml \
    --metric mlp_acc --training_mode default --seeds 2 --epochs 30

log "queue8 complete"
