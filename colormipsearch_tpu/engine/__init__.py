from colormipsearch_tpu.engine.cds import CDSParams, CDSearchEngine

__all__ = ["CDSParams", "CDSearchEngine"]
