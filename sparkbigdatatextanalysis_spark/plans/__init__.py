from .audit import PlanAudit, audit_plan, plan_string

__all__ = ["PlanAudit", "audit_plan", "plan_string"]
