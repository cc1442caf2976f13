from .base import AgentDef, Rollout  # noqa: F401
from .ppo import (  # noqa: F401
    AgentPPO, AgentA2C, AgentDiscretePPO, AgentDiscreteA2C, AgentPPOHterm,
    make_ppo,
)
from .dqn import (  # noqa: F401
    AgentDQN, AgentDoubleDQN, AgentDuelingDQN, AgentD3QN, make_dqn,
)
from .embed_dqn import AgentEmbedDQN, AgentEnsembleDQN, make_embed_dqn  # noqa: F401
from .ddpg_td3 import (  # noqa: F401
    AgentDDPG, AgentTD3, AgentDDPGHterm, AgentTD3Hterm, make_ddpg, make_td3,
    make_ddpg_hterm, make_td3_hterm,
)
from .sac import (  # noqa: F401
    AgentSAC, AgentModSAC, AgentSACHterm, AgentModSACHterm, make_sac,
)
from .pixel import AgentPixelPPO, make_pixel_ppo  # noqa: F401
