from .replay_buffer import ReplayBuffer, BufferState  # noqa: F401
from .runner import train_agent  # noqa: F401
from .evaluator import Evaluator  # noqa: F401
