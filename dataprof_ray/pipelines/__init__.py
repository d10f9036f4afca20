"""End-to-end pipelines. Import submodules directly, e.g.
``from dataprof_ray.pipelines import quality_filter, dedup``."""

from dataprof_ray.pipelines import (  # noqa: F401
    aggregate,
    curate,
    dedup,
    drift,
    export,
    join,
    lm,
    profile,
    quality_filter,
    sampling,
    similarity,
    textstats,
    window,
)
