from .lm import LMOptions, LMSummary, lm_solve  # noqa: F401
