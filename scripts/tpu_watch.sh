#!/bin/bash
# Poll the axon TPU tunnel; when a trivial jit answers, run the round-2
# bench queue (scripts/tpu_bench_queue.py). Resumable: a mid-queue tunnel
# drop aborts the queue, and the next poll success re-runs it with
# --skip-done so completed steps are not repeated. Exits when the queue
# logs its terminal "queue done" marker.
# Usage: nohup bash scripts/tpu_watch.sh >/dev/null 2>&1 &
cd /root/repo
LOG=/tmp/tpu_poll.log
for i in $(seq 1 140); do
  if timeout 90 python -c "
import jax
assert jax.default_backend() == 'tpu'
jax.jit(lambda x: x + 1)(1.0).block_until_ready()
print('up')" >/dev/null 2>&1; then
    echo "TPU up at $(date) (poll $i)" >> "$LOG"
    # the XLA remote-compile helper runs on this host: wait out any
    # CPU-heavy pytest run before benching (starved compiles lie)
    for j in $(seq 1 60); do
      pgrep -f "python -m pytest" >/dev/null || break
      sleep 60
    done
    timeout 36000 python scripts/tpu_bench_queue.py --skip-done \
      >> /tmp/tpu_queue_run.log 2>&1
    echo "queue pass done at $(date), exit $?" >> "$LOG"
    if grep -q '"done": true' BENCHLOG_r2.jsonl 2>/dev/null; then
      echo "queue complete $(date)" >> "$LOG"
      exit 0
    fi
    sleep 60  # transient drop mid-queue: fall through and re-poll
  else
    echo "down $(date)" >> "$LOG"
    sleep 300
  fi
done
echo "TPU never returned $(date)" >> "$LOG"
exit 1
