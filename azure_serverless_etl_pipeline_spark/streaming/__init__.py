from .file_ingest import start_energy_file_ingest

__all__ = ["start_energy_file_ingest"]
