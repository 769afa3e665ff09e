from tapdata_connectors_spark.plans.policies import WritePolicy

__all__ = ["WritePolicy"]
