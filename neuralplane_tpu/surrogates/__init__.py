from .tables import TABLE_REGISTRY, AeroTable, load_tables
from .train import train_surrogate, train_all, assemble_stacked_weights

__all__ = ["TABLE_REGISTRY", "AeroTable", "load_tables", "train_surrogate",
           "train_all", "assemble_stacked_weights"]
