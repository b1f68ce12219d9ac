from . import reprojection, gp_prior, priors  # noqa: F401
