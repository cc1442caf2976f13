#!/bin/bash
# Drive the learning-verification suite on the tunneled TPU.
#
# Process strategy: each FRESH python process risks minutes of device-claim
# recovery (relay grant wedge), so the bulk of the suite runs in ONE process
# per phase (--main-set: all standard configs; --specials: marl, population)
# with per-row checkpointing to /tmp/verify_rows.jsonl.  Stragglers (rows
# still missing after the bulk phases) get individual --only retries, and
# host-env configs run on CPU JAX (their env steps on the host; running on
# the TPU would pay the tunnel round-trip per step).
set -u
cd "$(dirname "$0")/.."
rm -f /tmp/verify_rows.jsonl

echo "=== phase 1: main set (one process) ===" >&2
timeout 14400 python -u scripts/verify_learning.py --main-set

echo "=== phase 2: specials (one process) ===" >&2
timeout 7200 python -u scripts/verify_learning.py --specials

echo "=== phase 3: host-env configs (CPU JAX) ===" >&2
timeout 1800 env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python -u scripts/verify_learning.py --only modsac_lander_host

echo "=== phase 4: straggler retries ===" >&2
MISSING=$(python - <<'EOF'
import ast, json
src = open('scripts/verify_learning.py').read()
tree = ast.parse(src)
names = []
for node in ast.walk(tree):
    if isinstance(node, ast.Assign) and getattr(node.targets[0], 'id', '') in ('CONFIGS', 'SPECIALS'):
        names += [k.value for k in node.value.keys]
try:
    done = {json.loads(l)['name'] for l in open('/tmp/verify_rows.jsonl')}
except FileNotFoundError:
    done = set()
print(' '.join(n for n in names if n not in done))
EOF
)
for cfg in $MISSING; do
    for attempt in 1 2; do
        echo "=== retry $cfg (attempt $attempt) ===" >&2
        # host-env configs must retry on CPU JAX too (env steps on the
        # host; TPU would pay the tunnel RTT per step), with a budget
        # matched to their known runtime (~27 min), not the TPU one
        case "$cfg" in
            *_host)
                timeout 3600 env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
                    python -u scripts/verify_learning.py --only "$cfg" && break
                ;;
            *)
                timeout 900 python -u scripts/verify_learning.py --only "$cfg" && break
                ;;
        esac
        sleep 60
    done
done

python scripts/verify_learning.py --collect
