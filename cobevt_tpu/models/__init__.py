"""Model zoo: FAX/SinBEVT camera->BEV encoders, FuseBEVT fusion, CorpBEVT."""
