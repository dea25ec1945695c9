from . import messages, transport  # noqa: F401
