"""Host-side data model: streams, network/event/template containers, IO."""

from .catalog import Catalog
from .events import Event, Template
from .groups import EventGroup, Stack, TemplateGroup
from .network import Network
from .readers import data_reader_hdf5, data_reader_mseed, write_hdf5_continuous
from .stationxml import ChannelResponse, Inventory, read_inventory
from .stream import Stream, Trace
from .travel_times import TravelTimes, get_moveout_array, load_travel_times
from .waveforms import Data, get_np_array

__all__ = [
    "Catalog",
    "ChannelResponse",
    "Data",
    "Event",
    "Inventory",
    "read_inventory",
    "EventGroup",
    "Network",
    "Stack",
    "Stream",
    "Template",
    "TemplateGroup",
    "Trace",
    "TravelTimes",
    "data_reader_hdf5",
    "data_reader_mseed",
    "get_moveout_array",
    "get_np_array",
    "load_travel_times",
    "write_hdf5_continuous",
]
