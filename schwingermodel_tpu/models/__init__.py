from schwingermodel_tpu.models.schwinger import SchwingerModel

__all__ = ["SchwingerModel"]
