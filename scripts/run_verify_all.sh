#!/bin/bash
# Drive the learning-verification suite one config per process, with a
# timeout + one retry per config (the tunneled TPU occasionally wedges a
# fresh process's device claim; a clean retry recovers).
set -u
cd "$(dirname "$0")/.."
rm -f /tmp/verify_rows.jsonl
CONFIGS=$(python - <<'EOF'
import ast, sys
src = open('scripts/verify_learning.py').read()
tree = ast.parse(src)
for node in ast.walk(tree):
    if isinstance(node, ast.Assign) and getattr(node.targets[0], 'id', '') in ('CONFIGS', 'SPECIALS'):
        print(' '.join(k.value for k in node.value.keys))
EOF
)
for cfg in $CONFIGS; do
    # host-env configs step Box2D on the host: every env step would pay the
    # TPU-tunnel round-trip, so they run on CPU JAX (the env is the
    # bottleneck, not the net math)
    if [ "$cfg" = "modsac_lander_host" ]; then
        ENVV=(env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu)
    else
        ENVV=(env)
    fi
    for attempt in 1 2; do
        echo "=== $cfg (attempt $attempt) ===" >&2
        timeout 900 "${ENVV[@]}" python -u scripts/verify_learning.py --only "$cfg" && break
        echo "=== $cfg attempt $attempt failed/timed out ===" >&2
        sleep 60
    done
done
python scripts/verify_learning.py --collect
