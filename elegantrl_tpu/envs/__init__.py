from .base import EnvSpec, EnvDef, VecEnv, vec_reset, vec_step  # noqa: F401
from .pendulum import PendulumEnv, make_pendulum  # noqa: F401
from .cartpole import CartPoleEnv, make_cartpole  # noqa: F401
from .point_chasing import (  # noqa: F401
    PointChasingEnv, PointChasingVecEnv, PointChasingDiscreteEnv,
    make_point_chasing, make_point_chasing_discrete,
)
from .stock_trading import (  # noqa: F401
    StockTradingEnv, StockTradingVecEnv, StockTradingVmapEnv, make_stock_trading,
)
from .lunar_lander import (  # noqa: F401
    LunarLanderEnv, LunarLanderContinuousEnv, make_lunar_lander,
)
from .hopper import HopperEnv, make_hopper  # noqa: F401
from .host_env import make_host_env  # noqa: F401
from .gym_parity import (  # noqa: F401
    get_env_args, gym_env_def, gym_hopper, gym_lunar_lander,
    gym_lunar_lander_continuous,
)
from .pixel_chasing import PixelChasingEnv, make_pixel_chasing  # noqa: F401
from .isaac import (  # noqa: F401
    IsaacVecEnv, SimUnavailable, load_isaac_task, make_isaac_env,
)
