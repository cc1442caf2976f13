"""Stock-trading environment (FinRL China-A-shares style) in pure JAX.

Capability match for the reference's ``StockTradingEnv`` /
``StockTradingVecEnv`` (``elegantrl/envs/StockTradingEnv.py``): daily trading
over S stocks with integer share lots, transaction cost, cash constraint and
delta-total-asset reward.  Same mechanics:

- actions in [-1, 1] per stock, dead-zone |a| < 0.1, scaled by ``max_stock``
  and truncated to integers (StockTradingEnv.py:71-75);
- stocks processed *sequentially* so buys compete for the same cash
  (StockTradingEnv.py:77-87) — here a ``lax.scan`` over the stock axis with
  (cash, shares) carry, vmapped over envs;
- reward = (total_asset_t - total_asset_{t-1}) * 2^-12; at the terminal step
  a bonus ``mean(episode rewards) / (1 - gamma)`` is added and
  ``cumulative_returns = total_asset / initial_amount * 100`` is recorded
  (StockTradingEnv.py:89-97);
- random reset jitters cash by U[0.75, 1.25) and holds |N(0,1)| * 2^7 shares
  (StockTradingVecEnv ``reset``, StockTradingEnv.py:218-231).

Market data: loads the reference's ``China_A_shares.numpy.npz`` if present,
otherwise generates a deterministic synthetic GBM market with the same shape
(1113 days x 15 stocks, 8 technical factors per stock).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import EnvDef, EnvSpec, VecEnv

_NPZ_CANDIDATES = (
    './China_A_shares.numpy.npz',
    './elegantrl_tpu/envs/China_A_shares.numpy.npz',
)
_SYN_DAYS = 1113
_SYN_STOCKS = 15
_SYN_TECHS_PER_STOCK = 8


def load_market_data(npz_path: Optional[str] = None) -> Tuple[np.ndarray, np.ndarray]:
    """Return (close, tech) float32 arrays of shape (T, S) and (T, 8*S)."""
    paths = (npz_path,) if npz_path else _NPZ_CANDIDATES
    for p in paths:
        if p and os.path.exists(p):
            d = np.load(p, allow_pickle=True)
            return (np.asarray(d['close_ary'], np.float32),
                    np.asarray(d['tech_ary'], np.float32))
    return synthetic_market_data()


_TECH_ID_LIST = ["macd", "boll_ub", "boll_lb", "rsi_30", "cci_30", "dx_30",
                 "close_30_sma", "close_60_sma"]


def dataframe_to_arrays(df, tech_id_list=None) -> Tuple[np.ndarray, np.ndarray]:
    """Convert the reference's pandas DataFrame layout to (close, tech)
    arrays with the reference's exact semantics
    (``StockTradingEnv.load_data_from_disk``, StockTradingEnv.py:113-131):
    one row per (day, stock); per day the tech vector is TECH-MAJOR —
    ``[tech0_stock0..tech0_stockS, tech1_stock0..., ...]`` — and close is
    the per-stock close series."""
    tech_id_list = _TECH_ID_LIST if tech_id_list is None else tech_id_list
    close_ary, tech_ary = [], []
    for day in range(len(df.index.unique())):
        item = df.loc[day]
        tech_items = [item[tech].values.tolist() for tech in tech_id_list]
        tech_ary.append(sum(tech_items, []))
        close_ary.append(item.close)
    return (np.array(close_ary, np.float32), np.array(tech_ary, np.float32))


def synthetic_market_data(days: int = _SYN_DAYS, stocks: int = _SYN_STOCKS,
                          seed: int = 1943) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic GBM market with simple moving-average/momentum technical
    factors, shaped like the reference dataset so configs transfer.
    """
    rng = np.random.default_rng(seed)
    p0 = rng.uniform(5.0, 80.0, size=stocks)
    drift = rng.normal(3e-4, 2e-4, size=stocks)
    vol = rng.uniform(0.01, 0.03, size=stocks)
    log_ret = rng.normal(drift, vol, size=(days, stocks))
    close = p0 * np.exp(np.cumsum(log_ret, axis=0))
    close = close.astype(np.float32)

    def sma(x, w):
        c = np.cumsum(np.pad(x, ((w, 0), (0, 0)), mode='edge'), axis=0)
        return (c[w:] - c[:-w]) / w

    sma12, sma26 = sma(close, 12), sma(close, 26)
    sma30, sma60 = sma(close, 30), sma(close, 60)
    macd = sma12 - sma26
    mom = np.diff(close, axis=0, prepend=close[:1])
    std30_num = sma(np.square(close), 30) - np.square(sma30)
    std30 = np.sqrt(np.maximum(std30_num, 0.0))
    boll_ub = sma30 + 2 * std30
    boll_lb = sma30 - 2 * std30
    rsi = 50.0 + 50.0 * np.tanh(sma(mom, 30) / (std30 + 1e-6))
    cci = (close - sma30) / (0.015 * (std30 + 1e-6))
    techs = np.stack([macd, boll_ub, boll_lb, rsi, np.clip(cci, -300, 300),
                      np.abs(np.tanh(mom)) * 100, sma30, sma60], axis=2)
    tech = techs.reshape(days, stocks * _SYN_TECHS_PER_STOCK).astype(np.float32)
    return close, tech


class StockState(NamedTuple):
    day: jax.Array           # () int32
    amount: jax.Array        # () cash
    shares: jax.Array        # (S,)
    total_asset: jax.Array   # ()
    reward_sum: jax.Array    # () running sum of episode rewards (for terminal bonus)
    cumulative_returns: jax.Array  # () recorded at terminal


def make_stock_trading(initial_amount: float = 1e6, max_stock: float = 1e2,
                       cost_pct: float = 1e-3, gamma: float = 0.99,
                       beg_idx: int = 0, end_idx: int = 1113,
                       if_random_reset: bool = True,
                       npz_path: Optional[str] = None) -> EnvDef:
    close_np, tech_np = load_market_data(npz_path)
    close = jnp.asarray(close_np[beg_idx:end_idx])
    tech = jnp.asarray(tech_np[beg_idx:end_idx])
    num_shares = close.shape[1]
    max_step = close.shape[0] - 1
    reward_scale = 2 ** -12
    state_dim = 1 + num_shares + close.shape[1] + tech.shape[1]

    def init(key: jax.Array) -> StockState:
        k1, k2 = jax.random.split(key)
        if if_random_reset:
            amount = initial_amount * (jax.random.uniform(k1, ()) * 0.5 + 0.75)
            shares = jnp.floor(jnp.abs(
                jnp.clip(jax.random.normal(k2, (num_shares,)), -2, 2)) * 2 ** 7)
        else:
            amount = jnp.asarray(initial_amount, jnp.float32)
            shares = jnp.zeros(num_shares, jnp.float32)
        total_asset = jnp.sum(close[0] * shares) + amount
        return StockState(jnp.zeros((), jnp.int32), amount, shares, total_asset,
                          jnp.zeros(()), jnp.zeros(()))

    def obs(s: StockState) -> jax.Array:
        return jnp.concatenate([
            jnp.tanh(s.amount * 2 ** -18)[None],
            jnp.tanh(s.shares * 2 ** -10),
            close[s.day] * 2 ** -7,
            tech[s.day] * 2 ** -6,
        ])

    def step(s: StockState, action: jax.Array, key: jax.Array):
        del key
        day = s.day + 1
        prices = close[day]

        a = jnp.where(jnp.abs(action) < 0.1, 0.0, action)
        a_int = jnp.trunc(a * max_stock)

        def trade_one(carry, xs):
            amount, = carry
            a_i, price, share_i = xs
            can_buy = jnp.floor(amount / price)
            buy = jnp.where(a_i > 0, jnp.minimum(can_buy, a_i), 0.0)
            sell = jnp.where(a_i > 0, 0.0, jnp.clip(-a_i, 0.0, share_i))
            amount = (amount - price * buy * (1 + cost_pct)
                      + price * sell * (1 - cost_pct))
            return (amount,), share_i + buy - sell

        (amount,), shares = jax.lax.scan(
            trade_one, (s.amount,), (a_int, prices, s.shares))

        total_asset = jnp.sum(prices * shares) + amount
        reward = (total_asset - s.total_asset) * reward_scale
        reward_sum = s.reward_sum + reward

        terminal = day >= max_step
        bonus = (reward_sum / day.astype(jnp.float32)) / (1.0 - gamma)
        reward = jnp.where(terminal, reward + bonus, reward)
        cum_returns = jnp.where(terminal, total_asset / initial_amount * 100.0,
                                s.cumulative_returns)
        truncate = jnp.zeros((), jnp.bool_)
        return (StockState(day, amount, shares, total_asset, reward_sum, cum_returns),
                reward, terminal, truncate)

    spec = EnvSpec(env_name='StockTradingEnv-v2', num_envs=1, max_step=max_step,
                   state_dim=state_dim, action_dim=num_shares, if_discrete=False)
    from ..ops.pallas_rollout import make_stock_body
    body = make_stock_body(close, tech, initial_amount=initial_amount,
                           max_stock=max_stock, cost_pct=cost_pct,
                           gamma=gamma, if_random_reset=if_random_reset)
    return EnvDef(spec=spec, init=init, obs=obs, step=step,
                  episode_return=lambda s: s.cumulative_returns,
                  kernel_body=body)


class StockTradingVecEnv(VecEnv):
    def __init__(self, initial_amount: float = 1e6, max_stock: float = 1e2,
                 cost_pct: float = 1e-3, gamma: float = 0.99,
                 beg_idx: int = 0, end_idx: int = 1113, num_envs: int = 4,
                 if_random_reset: bool = True, seed: int = 0, **_kwargs):
        super().__init__(
            make_stock_trading(initial_amount, max_stock, cost_pct, gamma,
                               beg_idx, end_idx, if_random_reset),
            num_envs=num_envs, seed=seed)

    @property
    def cumulative_returns(self):
        if self._state is None:
            return 0.0
        return np.asarray(self._state.cumulative_returns).tolist()


class StockTradingEnv(StockTradingVecEnv):
    def __init__(self, **kwargs):
        kwargs.setdefault('num_envs', 1)
        super().__init__(**kwargs)


class StockTradingVmapEnv(StockTradingVecEnv):
    """Name alias for the reference's helloworld ``StockTradingVmapEnv``."""
