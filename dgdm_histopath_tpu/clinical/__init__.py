"""Clinical layer (reference ``dgdm_histopath/clinical/``)."""

from .fda_validation import (
    ClinicalCohort, ClinicalDataManager, ClinicalPerformanceAnalyzer,
    FDASubmissionManager, DEFAULT_ACCEPTANCE,
)
from .pacs_integration import (
    DICOMHandler, DICOMMetadata, EHRConnector, PACSEHRIntegrationManager,
    PHI_DICOM_TAGS,
)

__all__ = [
    "ClinicalCohort", "ClinicalDataManager", "ClinicalPerformanceAnalyzer",
    "FDASubmissionManager", "DEFAULT_ACCEPTANCE",
    "DICOMHandler", "DICOMMetadata", "EHRConnector",
    "PACSEHRIntegrationManager", "PHI_DICOM_TAGS",
]
