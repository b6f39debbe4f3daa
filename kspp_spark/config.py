"""Environment-driven cluster configuration — parity with the
reference's cluster_config (include/kspp/cluster_config.h,
src/cluster_config.cpp) and its env-var conventions
(src/utils/env.cpp:33-66): the same KSPP_* variables with the same
defaults, the same feature-gated load_config_from_env, the same
validate-or-warn semantics for broker lists and TLS material — so a
deployment configured for the reference drops onto this engine with
its environment unchanged.

The Spark-facing addition is `kafka_options()`: the configured broker
URI list and TLS paths translated into the Spark Kafka source/sink
option map (bootstrap servers without scheme, security.protocol from
the URI scheme, and the Java client's KIP-651 PEM truststore/keystore
configs when TLS material is configured — the reference's librdkafka
option names would be silently ignored by the client Spark embeds).
"""

from __future__ import annotations

import os
import uuid
import warnings
from dataclasses import dataclass, field

from kspp_spark.utils import split_url_list


# --- env.cpp parity: same variables, same defaults --------------------


def default_kafka_broker_uri() -> str:  # env.cpp:33
    return os.environ.get("KSPP_KAFKA_BROKER_URL", "plaintext://localhost:9092")


def default_kafka_rest_uri() -> str:  # env.cpp:37
    return os.environ.get("KSPP_KAFKA_REST_URL", "http://localhost:8082")


def default_schema_registry_uri() -> str:  # env.cpp:41
    return os.environ.get("KSPP_SCHEMA_REGISTRY_URL", "http://localhost:8081")


def default_statestore_root() -> str:  # env.cpp:45
    return os.environ.get(
        "KSPP_STATE_STORE_ROOT", os.path.expanduser("~/kspp/state-stores")
    )


def default_pushgateway_uri() -> str:  # env.cpp:50
    return os.environ.get("KSPP_PUSHGATEWAY_URL", "http://localhost:9091")


def default_ca_cert_path() -> str:  # env.cpp:54
    return os.environ.get("KSPP_CA_CERT", "/etc/kspp/credentials/cacert.pem")


def default_client_cert_path() -> str:  # env.cpp:58
    return os.environ.get(
        "KSPP_CLIENT_CERT", "/etc/kspp/credentials/client.pem"
    )


def default_client_key_path() -> str:  # env.cpp:62
    return os.environ.get("KSPP_CLIENT_KEY", "/etc/kspp/credentials/client.key")


def default_client_key_passphrase() -> str:  # env.cpp:66 (never logged)
    return os.environ.get("KSPP_CLIENT_KEY_PASSPHRASE", "")


# --- cluster_config parity ---------------------------------------------

# feature flags (cluster_config.h): which subsystems load_config_from_env
# configures
KAFKA = 1
SCHEMA_REGISTRY = 2
STATE_STORE = 4
PUSHGATEWAY = 8


@dataclass
class ClusterConfig:
    """cluster_config.h surface on Spark. consumer_group defaults to a
    random uuid exactly like the reference's consumer_group_or_random
    (cluster_config.cpp:16-22)."""

    consumer_group: str = ""
    flags: int = KAFKA | SCHEMA_REGISTRY
    brokers: str = ""
    schema_registry_uri: str = ""
    pushgateway_uri: str = ""
    storage_root: str = ""
    ca_cert_path: str = ""
    client_cert_path: str = ""
    client_key_path: str = ""
    client_key_passphrase: str = field(default="", repr=False)

    def __post_init__(self) -> None:
        if not self.consumer_group:
            self.consumer_group = str(uuid.uuid4())

    def has_feature(self, flag: int) -> bool:
        return bool(self.flags & flag)

    def load_config_from_env(self) -> "ClusterConfig":
        """cluster_config.cpp:37-59: configure each enabled subsystem
        from the KSPP_* environment; TLS client auth only engages when
        the CA cert actually exists (warn-and-ignore otherwise)."""
        if self.has_feature(KAFKA):
            self.set_brokers(default_kafka_broker_uri())
        if self.has_feature(STATE_STORE):
            self.set_storage_root(default_statestore_root())
        if self.set_ca_cert_path(default_ca_cert_path()):
            self.set_private_key_path(
                default_client_cert_path(),
                default_client_key_path(),
                default_client_key_passphrase(),
            )
        if self.has_feature(SCHEMA_REGISTRY):
            self.schema_registry_uri = default_schema_registry_uri()
        if self.has_feature(PUSHGATEWAY):
            self.pushgateway_uri = default_pushgateway_uri()
        return self

    def set_brokers(self, brokers: str) -> None:
        """Validate the broker list through the url parser with the
        reference's 'plaintext' default scheme; an unparseable list is
        fatal (cluster_config.cpp:69-74)."""
        if not split_url_list(brokers, "plaintext"):
            raise ValueError(
                f"cluster_config: bad broker config - bad uri: {brokers}"
            )
        self.brokers = brokers

    def set_storage_root(self, root_path: str) -> None:
        """Create the state-store root if missing; failure to create is
        fatal (cluster_config.cpp:76-84)."""
        os.makedirs(root_path, exist_ok=True)
        if not os.path.isdir(root_path):
            raise ValueError(
                f"cluster_config: failed to create storage path at: {root_path}"
            )
        self.storage_root = root_path

    def set_ca_cert_path(self, path: str) -> bool:
        """Warn-and-ignore when the CA cert is absent
        (cluster_config.cpp:90-97)."""
        if not os.path.exists(path):
            warnings.warn(
                f"cluster_config: ca_cert not found at: {path}, "
                "ignoring ssl config"
            )
            return False
        self.ca_cert_path = path
        return True

    def set_private_key_path(
        self, client_cert_path: str, private_key_path: str, passphrase: str = ""
    ) -> bool:
        """Both client cert AND key must exist or the whole client-auth
        config is ignored with a warning (cluster_config.cpp:103-120)."""
        ok = True
        if not os.path.exists(private_key_path):
            warnings.warn(
                f"cluster_config: private_key_path not found at: {private_key_path}"
            )
            ok = False
        if not os.path.exists(client_cert_path):
            warnings.warn(
                f"cluster_config: client_cert not found at: {client_cert_path}"
            )
            ok = False
        if not ok:
            warnings.warn(
                "cluster_config: ssl client auth config incomplete, "
                "ignoring config"
            )
            return False
        self.client_cert_path = client_cert_path
        self.client_key_path = private_key_path
        self.client_key_passphrase = passphrase
        return True

    # --- the Spark-facing translation ---------------------------------

    def kafka_options(self) -> dict[str, str]:
        """The configured brokers + TLS as Spark Kafka source/sink
        options: schemes drop out of bootstrap.servers (Spark wants
        host:port), the scheme selects kafka.security.protocol
        (plaintext -> PLAINTEXT, ssl -> SSL), and configured TLS
        material translates to the Java client's KIP-651 PEM configs
        (truststore location for the CA, inline keystore chain/key
        for client auth). A scheme stated once on the
        first element covers the unschemed rest ('ssl://b1,b2' is one
        SSL listener list — the natural multi-broker shape);
        EXPLICITLY mixed schemes are rejected — one listener type per
        connection, as in the reference's librdkafka config. An
        unparseable broker list is as fatal here as in set_brokers."""
        raw = self.brokers or default_kafka_broker_uri()
        uris = split_url_list(raw, "plaintext")
        if not uris:
            raise ValueError(
                f"cluster_config: bad broker config - bad uri: {raw}"
            )
        # unschemed elements inherit the FIRST element's scheme
        uris = split_url_list(raw, uris[0].scheme)
        schemes = {u.scheme for u in uris}
        if len(schemes) > 1:
            raise ValueError(
                f"cluster_config: mixed broker schemes: {sorted(schemes)}"
            )
        scheme = schemes.pop()
        opts = {
            "kafka.bootstrap.servers": ",".join(u.authority for u in uris),
            "kafka.security.protocol": "SSL" if scheme == "ssl" else "PLAINTEXT",
        }
        if scheme == "ssl" and self.ca_cert_path:
            # The reference configures librdkafka (ssl.ca.location /
            # ssl.certificate.location / ssl.key.location,
            # rd_kafka_utils.cpp), but Spark's Kafka source/sink uses
            # the Apache Kafka JAVA client, which ignores unknown
            # configs — so those names would leave SSL engaged with no
            # trust or client auth. Translate to the Java client's PEM
            # configs (KIP-651): the CA bundle file is a valid PEM
            # truststore as-is; the separate cert/key FILES of the
            # librdkafka convention have no two-file keystore form, so
            # their contents ride inline via ssl.keystore.
            # certificate.chain + ssl.keystore.key (both official
            # KIP-651 configs, password-protected keys honored via
            # ssl.key.password).
            # SECURITY: the inline ssl.keystore.key value below is a
            # private key carried as a plain source OPTION. The Kafka
            # client treats it as a Password config, but Spark surfaces
            # source options in plans / the UI / event logs, and the
            # DEFAULT spark.redaction.regex (secret|password|token|
            # access.key) does NOT match 'ssl.keystore.key'. Deployers
            # must either extend spark.redaction.regex to cover
            # '(?i)ssl.keystore.key|ssl.key.password' or convert the
            # PEM pair to a PKCS12 keystore file and set
            # kafka.ssl.keystore.{type=PKCS12,location,password} so key
            # material stays file-based (both documented in KAFKA.md).
            opts["kafka.ssl.truststore.type"] = "PEM"
            opts["kafka.ssl.truststore.location"] = self.ca_cert_path
            if self.client_cert_path and self.client_key_path:
                ext = os.path.splitext(self.client_cert_path)[1].lower()
                if ext in (".p12", ".pfx", ".jks"):
                    # File-based alternative: point KSPP_CLIENT_CERT at
                    # a PKCS12/JKS keystore (KSPP_CLIENT_KEY_PASSPHRASE
                    # is its password) and key material never enters
                    # the option map — only the path does.
                    opts["kafka.ssl.keystore.type"] = (
                        "JKS" if ext == ".jks" else "PKCS12"
                    )
                    opts["kafka.ssl.keystore.location"] = self.client_cert_path
                    if self.client_key_passphrase:
                        opts["kafka.ssl.keystore.password"] = (
                            self.client_key_passphrase
                        )
                else:
                    with open(self.client_cert_path, "r") as f:
                        chain = f.read()
                    with open(self.client_key_path, "r") as f:
                        key_pem = f.read()
                    opts["kafka.ssl.keystore.type"] = "PEM"
                    opts["kafka.ssl.keystore.certificate.chain"] = chain
                    opts["kafka.ssl.keystore.key"] = key_pem
                    if self.client_key_passphrase:
                        opts["kafka.ssl.key.password"] = self.client_key_passphrase
        return opts
