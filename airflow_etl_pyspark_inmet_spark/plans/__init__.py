from .inmet_pipeline import (  # noqa: F401
    build_cidades,
    build_previsoes,
    build_datas,
    dim_cidade_atributos,
    fato_agg_previsoes_dia,
    cidade_kpis_mensal,
    run_pipeline,
)
