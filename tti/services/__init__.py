from tti.services.database import DatabaseHandler
from tti.services.serial_reader import SerialReader
from tti.services.mqtt import MqttHeartbeat
from tti.services.cleaner import FileCleanerThread
from tti.services.hardware import find_camera, find_esp32

__all__ = [
    "DatabaseHandler",
    "SerialReader",
    "MqttHeartbeat",
    "FileCleanerThread",
    "find_camera",
    "find_esp32",
]
