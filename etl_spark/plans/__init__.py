from etl_spark.plans.depara import (
    SchemaContractError,
    apply_de_para,
    check_contract,
    impose_types,
    with_additive_columns,
)

__all__ = [
    "SchemaContractError",
    "apply_de_para",
    "check_contract",
    "impose_types",
    "with_additive_columns",
]
