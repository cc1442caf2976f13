"""Policy serving: batched greedy inference behind a tiny HTTP endpoint.

The reference's deployment surface is ``examples/plan_PaperTradingEnv_PPO.py``
— train, then hand the actor to an external live-trading loop
(``AlpacaPaperTrading``, finrl).  That depends on external services; the
native equivalent here is a self-contained policy server: load an ``.npz``
checkpoint saved by training, jit the greedy path once, and serve batched
``obs -> action`` over HTTP (stdlib only, threaded).  One process owns the
accelerator; any number of clients (paper-trading loops, simulators,
dashboards) post observation batches.

    from elegantrl_tpu.serve import PolicyServer
    srv = PolicyServer(AgentPPO, net_dims=(64, 64), env_args={...},
                       checkpoint='cwd/agent.npz')
    srv.start(port=8400)          # non-blocking; srv.stop() to shut down

    POST /act    {"obs": [[...], ...]}  ->  {"action": [[...], ...]}
    GET  /health                        ->  {"ok": true, "requests": N}

Design notes (TPU): the greedy fn is jitted per observed batch shape and
cached; irregular client batches are padded up to the next power of two so
the number of compiled variants stays logarithmic.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Optional

import jax
import numpy as np

from .config import Config
from .utils.checkpoint import load_pytree


class PolicyServer:
    def __init__(self, agent_class, net_dims, env_args: dict,
                 checkpoint: str, args: Optional[Config] = None):
        args = args or Config(agent_class, None, dict(env_args))
        args.net_dims = net_dims
        from .train.runner import _make_agent
        rb = None
        if args.if_off_policy:
            # off-policy factories need a buffer object only for update();
            # serving never updates — give them a 1-slot dummy
            from .train.replay_buffer import ReplayBuffer
            rb = ReplayBuffer(max_size=8, state_dim=args.state_dim,
                              action_dim=args.action_dim, num_seqs=1,
                              if_discrete=bool(args.if_discrete), args=args)
        agent = _make_agent(args, rb)
        self.state_dim = int(args.state_dim)
        self.if_discrete = bool(args.if_discrete)
        state = agent.init(jax.random.key(0))
        self.agent_state = load_pytree(checkpoint, state)
        self._greedy = jax.jit(agent.greedy_action)
        self.requests = 0
        self._httpd = None
        self._thread = None

    def act(self, obs: np.ndarray) -> np.ndarray:
        """Batched greedy action; pads the batch to the next power of two so
        repeated irregular sizes reuse a small set of compiled variants."""
        obs = np.asarray(obs, np.float32)
        squeeze = obs.ndim == 1
        if squeeze:
            obs = obs[None]
        n = obs.shape[0]
        padded = 1 << (n - 1).bit_length()
        if padded != n:
            obs = np.concatenate(
                [obs, np.zeros((padded - n, obs.shape[1]), np.float32)])
        action = np.asarray(self._greedy(self.agent_state, obs))[:n]
        self.requests += 1
        return action[0] if squeeze else action

    # ---- HTTP layer -------------------------------------------------------

    def start(self, host: str = '127.0.0.1', port: int = 8400) -> int:
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _reply(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header('Content-Type', 'application/json')
                self.send_header('Content-Length', str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == '/health':
                    self._reply(200, {'ok': True,
                                      'requests': server.requests,
                                      'state_dim': server.state_dim,
                                      'if_discrete': server.if_discrete})
                else:
                    self._reply(404, {'error': 'unknown path'})

            def do_POST(self):
                if self.path != '/act':
                    self._reply(404, {'error': 'unknown path'})
                    return
                try:
                    n = int(self.headers.get('Content-Length', 0))
                    req = json.loads(self.rfile.read(n))
                    action = server.act(np.asarray(req['obs'], np.float32))
                    self._reply(200, {'action': np.asarray(action).tolist()})
                except Exception as e:  # client error surface
                    self._reply(400, {'error': f'{type(e).__name__}: {e}'})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self._httpd.server_address[1]

    def stop(self):
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
