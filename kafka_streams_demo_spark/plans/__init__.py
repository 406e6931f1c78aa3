from kafka_streams_demo_spark.plans.explain import PlanAudit, audit, formatted_plan

__all__ = ["PlanAudit", "audit", "formatted_plan"]
