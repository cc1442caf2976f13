#!/bin/bash
# Drive the learning-verification suite on the tunneled TPU.
#
# Process strategy: each FRESH python process risks minutes of device-claim
# recovery (relay grant wedge), so the bulk of the suite runs in ONE process
# per phase (--main-set: all standard configs; --specials: marl, population)
# with per-row checkpointing to /tmp/verify_rows.jsonl.  Stragglers (rows
# still missing after the bulk phases) get individual --only retries.
# Host-env configs run on the TPU like everything else: host-rollout mode
# (train/runner.py) steps the env on the host and only dispatches the SGD
# update to the device, so there is no per-step tunnel round-trip anymore.
set -u
cd "$(dirname "$0")/.."
rm -f /tmp/verify_rows.jsonl

echo "=== phase 1: main set (one process) ===" >&2
timeout 14400 python -u scripts/verify_learning.py --main-set

echo "=== phase 2: specials (one process) ===" >&2
timeout 7200 python -u scripts/verify_learning.py --specials

echo "=== phase 3: host-env configs (host-rollout mode on TPU) ===" >&2
timeout 1800 python -u scripts/verify_learning.py --only modsac_lander_host
timeout 1800 python -u scripts/verify_learning.py --only ppoh_hopper_mujoco_host
timeout 1800 python -u scripts/verify_learning.py --only sac_hopper_mujoco_host
timeout 1800 python -u scripts/verify_learning.py --only sac_halfcheetah_mujoco_host
timeout 1800 python -u scripts/verify_learning.py --only sac_ant_mujoco_host

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
        # host-env configs get a budget matched to their host-bound env
        # stepping (minutes, not seconds), the rest the standard TPU one
        case "$cfg" in
            *_host)
                timeout 3600 python -u scripts/verify_learning.py --only "$cfg" && break
                ;;
            *)
                timeout 900 python -u scripts/verify_learning.py --only "$cfg" && break
                ;;
        esac
        sleep 60
    done
done

python scripts/verify_learning.py --collect
