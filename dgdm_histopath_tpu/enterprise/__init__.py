"""Enterprise layer (reference ``dgdm_histopath/enterprise/``)."""

from .multi_tenant import (
    Tenant, TenantQuota, TenantResourceManager, TenantIsolationManager,
    TenantAuthenticationManager, MultiTenantManager, ROLES, ROLE_PERMISSIONS,
)

__all__ = [
    "Tenant", "TenantQuota", "TenantResourceManager", "TenantIsolationManager",
    "TenantAuthenticationManager", "MultiTenantManager", "ROLES",
    "ROLE_PERMISSIONS",
]
