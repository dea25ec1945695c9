from . import mac, pdcp, rlc, sdap  # noqa: F401
