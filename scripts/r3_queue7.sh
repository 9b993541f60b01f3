#!/bin/bash
# Round-3 queue, leg 7: dual-ViT root-cause diagnostics, then remaining seeds.
#
# 0. Wait for the in-flight seed-1 100-epoch run (pid in /tmp/r3f_s1.pid).
# 1. Diagnostic A: 30 ep with the L2-normalize-before-softmax quirk OFF
#    (standard-DINO loss geometry) — if this rescues training, the collapse is
#    the reference recipe's own dynamics on this corpus, not an implementation
#    error (fwd/bwd already proven byte-exact vs the reference torch modules).
# 2. Diagnostic B: 30 ep with teacher_temperature 0.07 (canonical DINO value;
#    reference uses 0.04) — same reasoning, different knob.
# 3. Remaining protocol seeds 2,3 (100 ep each) for the PARITY table.
# Idempotent via done-markers. Logs: /tmp/r3g_*.log.
set -u
cd /root/repo

Q=/tmp/r3g_queue.log
log() { echo "[queue7 $(date +%H:%M:%S)] $*" >> "$Q"; }

if [ -f /tmp/r3f_s1.pid ]; then
  log "waiting on dualvit seed1 pid $(cat /tmp/r3f_s1.pid)"
  while kill -0 "$(cat /tmp/r3f_s1.pid)" 2>/dev/null; do sleep 30; done
  log "seed1 done"
fi

run_job() { # name bound_s cmd...
  local name=$1 bound=$2; shift 2
  local marker=/tmp/r3g_done_$name
  if [ -f "$marker" ]; then log "skip $name (done)"; return 0; fi
  log "start $name: $*"
  timeout "$bound" "$@" > "/tmp/r3g_${name}.log" 2>&1
  local rc=$?
  log "end $name rc=$rc"
  [ $rc -eq 0 ] && touch "$marker"
  return $rc
}

# Build the diagnostic configs from the parity config.
python - <<'EOF'
import yaml
base = yaml.safe_load(open('configs/config_parity_synth.yaml'))
a = dict(base); a.setdefault('reference_faithful', {})
a['reference_faithful'] = dict(a.get('reference_faithful') or {},
                               l2_normalize_before_softmax=False)
yaml.safe_dump(a, open('/tmp/diag_no_l2norm.yaml', 'w'))
b = yaml.safe_load(open('configs/config_parity_synth.yaml'))
b['hyperparameters']['teacher_temperature'] = 0.07
yaml.safe_dump(b, open('/tmp/diag_tt007.yaml', 'w'))
EOF

run_job diag_no_l2norm 7200 \
  env AVMNIST_MAX_SCAN_STEPS=64 AVMNIST_RUN_NAME=dualvit_diag_no_l2norm \
  python -u run_dino.py --model multi_dual_vit --config /tmp/diag_no_l2norm.yaml \
    --metric mlp_acc --training_mode default --seeds 1 --epochs 30

run_job diag_tt007 7200 \
  env AVMNIST_MAX_SCAN_STEPS=64 AVMNIST_RUN_NAME=dualvit_diag_tt007 \
  python -u run_dino.py --model multi_dual_vit --config /tmp/diag_tt007.yaml \
    --metric mlp_acc --training_mode default --seeds 1 --epochs 30

for s in 2 3; do
  run_job "dualvit_s${s}" 14400 \
    env AVMNIST_MAX_SCAN_STEPS=64 \
    python -u run_dino.py --model multi_dual_vit --config configs/config_parity_synth.yaml \
      --metric mlp_acc --training_mode default --seeds "$s"
done

log "queue7 complete"
