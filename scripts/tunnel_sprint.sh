#!/bin/bash
# Tunnel-revival evidence sprint (VERDICT r4 #4): probe the axon TPU tunnel
# on a cadence; the moment it answers, collect the on-chip evidence that has
# been blocked since the round-3 relay kill, in value order:
#   1. bench.py            — headline + hostile render FPS + lift views/s
#   2. officescene lift    — per-stage table at a tunnel-sized view count
#   3. pseudo-label loop   — the LERF v5e rows (36 frames / 128² / 2000 it)
# Each stage's JSON/log lands in results/sprint/; the probe log keeps the
# BASELINE.md cadence format either way.
#
# Usage: nohup bash scripts/tunnel_sprint.sh & — exits after one sprint (or
# runs forever probing if the tunnel stays dead).

set -u
cd "$(dirname "$0")/.."
mkdir -p results/sprint

while true; do
  ts=$(date -u '+%Y-%m-%d %H:%M')
  timeout 60 python -c 'import jax; print(jax.devices())' \
      > /tmp/probe_out.txt 2>&1
  rc=$?
  echo "| $ts | rc=$rc $( [ $rc -eq 0 ] && echo '— ALIVE' || echo '— dead' ) |" \
      >> results/sprint/probe_log.md
  if [ $rc -eq 0 ]; then
    echo "[SPRINT] tunnel alive at $ts — collecting TPU evidence" \
        >> results/sprint/probe_log.md
    timeout 3600 python bench.py > results/sprint/bench.json 2> /tmp/sprint_bench.log
    timeout 7200 python scripts/officescene_scale_run.py \
        --work /tmp/officescene_sprint --lift_views 16 \
        > results/sprint/officescene.log 2>&1
    timeout 21600 python scripts/pseudo_label_loop.py \
        --out /tmp/loop36_v5e --frames 36 --size 128 --iterations 2000 \
        > results/sprint/loop36_v5e.json 2> /tmp/sprint_loop.log
    echo "[SPRINT] done $(date -u '+%Y-%m-%d %H:%M')" >> results/sprint/probe_log.md
    exit 0
  fi
  sleep 900
done
