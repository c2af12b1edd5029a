from .metrics import average_precision, pr_curve  # noqa: F401
