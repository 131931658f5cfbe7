from .inmet_pipeline import (  # noqa: F401
    build_cidades,
    build_previsoes,
    build_datas,
    dim_cidade_atributos,
    fato_agg_previsoes_dia,
    cidade_kpis_mensal,
    run_pipeline,
)
from .snapshot import (  # noqa: F401
    snapshot_changes,
    snapshot_compact,
    snapshot_history,
    snapshot_merge,
    snapshot_read,
    snapshot_vacuum,
    snapshot_write,
    stream_merge_to_snapshot,
)
