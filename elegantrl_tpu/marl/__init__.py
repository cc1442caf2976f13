from .env import MultiAgentEnvDef  # noqa: F401
from .chasing import make_team_chasing  # noqa: F401
from .mappo import make_mappo, train_mappo  # noqa: F401
