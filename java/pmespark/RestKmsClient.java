package pmespark;

import java.io.FileInputStream;
import java.io.IOException;
import java.net.URI;
import java.net.http.HttpClient;
import java.net.http.HttpRequest;
import java.net.http.HttpResponse;
import java.security.KeyStore;
import java.security.cert.Certificate;
import java.security.cert.CertificateFactory;
import java.time.Duration;
import java.util.Base64;

import javax.net.ssl.SSLContext;
import javax.net.ssl.TrustManagerFactory;

import org.apache.hadoop.conf.Configuration;
import org.apache.parquet.crypto.KeyAccessDeniedException;
import org.apache.parquet.crypto.ParquetCryptoRuntimeException;
import org.apache.parquet.crypto.keytools.KmsClient;

/**
 * parquet-mr KmsClient speaking the engine's REST wrap/unwrap protocol
 * (the JVM twin of crypto/kms_client.py, which itself mirrors the
 * reference repo's kms_client.py): POST {"key": "&lt;b64&gt;"} to
 * /api/v1/{wrap|unwrap}/{keyId} with the caller's token in the x-api-key
 * header, 5 s timeout. Registered via
 * parquet.encryption.kms.client.class so Spark's own parquet
 * reader/writer (PropertiesDrivenCryptoFactory) encrypts and decrypts
 * natively — distributed scans, vectorized reader, no Python in the path.
 *
 * A 403 surfaces as KeyAccessDeniedException, which parquet-mr propagates
 * as a task failure: unauthorized projections fail the query, matching
 * the reference's failure semantics.
 *
 * No JSON library dependency: the body is a single base64 string field,
 * extracted with string operations (base64 cannot contain '"').
 */
public class RestKmsClient implements KmsClient {

  private String kmsUrl;
  private String token;
  private HttpClient http;

  @Override
  public void initialize(
      Configuration configuration, String kmsInstanceID, String kmsInstanceURL, String accessToken)
      throws KeyAccessDeniedException {
    this.kmsUrl = kmsInstanceURL.replaceAll("/+$", "");
    this.token = accessToken;
    HttpClient.Builder builder = HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(5));
    // TLS: trust SSL_CERT_FILE when set, like the Python/reference clients
    // (reference kms_client.py:36-37 builds an ssl context from the same
    // env var). Absent the var, the JDK default truststore applies.
    String certFile = System.getenv("SSL_CERT_FILE");
    if (this.kmsUrl.startsWith("https") && certFile != null && !certFile.isEmpty()) {
      builder.sslContext(sslContextFrom(certFile));
    }
    this.http = builder.build();
  }

  /** SSLContext trusting the PEM certificate(s) in the given file. */
  static SSLContext sslContextFrom(String pemPath) {
    try (FileInputStream in = new FileInputStream(pemPath)) {
      CertificateFactory cf = CertificateFactory.getInstance("X.509");
      KeyStore ks = KeyStore.getInstance(KeyStore.getDefaultType());
      ks.load(null, null);
      int i = 0;
      for (Certificate cert : cf.generateCertificates(in)) {
        ks.setCertificateEntry("ssl-cert-file-" + (i++), cert);
      }
      TrustManagerFactory tmf =
          TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm());
      tmf.init(ks);
      SSLContext ctx = SSLContext.getInstance("TLS");
      ctx.init(null, tmf.getTrustManagers(), null);
      return ctx;
    } catch (Exception e) {
      throw new ParquetCryptoRuntimeException("failed to load SSL_CERT_FILE " + pemPath, e);
    }
  }

  @Override
  public String wrapKey(byte[] keyBytes, String masterKeyIdentifier)
      throws KeyAccessDeniedException {
    return post("wrap", masterKeyIdentifier, Base64.getEncoder().encodeToString(keyBytes));
  }

  @Override
  public byte[] unwrapKey(String wrappedKey, String masterKeyIdentifier)
      throws KeyAccessDeniedException {
    return Base64.getDecoder().decode(post("unwrap", masterKeyIdentifier, wrappedKey));
  }

  private String post(String action, String keyId, String keyB64) throws KeyAccessDeniedException {
    HttpRequest.Builder builder =
        HttpRequest.newBuilder()
            .uri(URI.create(kmsUrl + "/api/v1/" + action + "/" + keyId))
            .timeout(Duration.ofSeconds(5))
            .header("Content-Type", "application/json")
            .POST(HttpRequest.BodyPublishers.ofString("{\"key\": \"" + keyB64 + "\"}"));
    if (token != null && !token.isEmpty() && !"DEFAULT".equals(token)) {
      builder.header("x-api-key", token);
    }
    HttpResponse<String> resp = null;
    IOException lastIo = null;
    // Bounded retry on transport-level IOException only (never on an HTTP
    // status): a fleet of executors opening connections in one burst hits
    // transient resets/keep-alive races ("header parser received no
    // bytes") that a fresh attempt resolves; 403/422 are authorization
    // answers and must surface immediately, unretried.
    for (int attempt = 0; attempt < 3; attempt++) {
      try {
        if (attempt > 0) {
          Thread.sleep(50L << attempt);
        }
        resp = http.send(builder.build(), HttpResponse.BodyHandlers.ofString());
        lastIo = null;
        break;
      } catch (IOException e) {
        lastIo = e;
      } catch (InterruptedException e) {
        Thread.currentThread().interrupt();
        throw new ParquetCryptoRuntimeException(
            "KMS " + action + " request for key " + keyId + " to " + kmsUrl
                + " interrupted",
            e);
      }
    }
    if (resp == null) {
      // Attributable outage surfacing: a task that cannot reach the KMS
      // must name the endpoint and key, so a 1000-executor failure wave
      // reads as "KMS down", not as an opaque parquet error.
      throw new ParquetCryptoRuntimeException(
          "KMS " + action + " request for key " + keyId + " to " + kmsUrl
              + " failed (server unreachable or timed out after 5s, 3 attempts)",
          lastIo);
    }
    if (resp.statusCode() == 403) {
      throw new KeyAccessDeniedException(
          "token not authorized to " + action + " key " + keyId + ": " + resp.body());
    }
    if (resp.statusCode() != 200) {
      throw new ParquetCryptoRuntimeException(
          "KMS " + action + " failed (" + resp.statusCode() + "): " + resp.body());
    }
    return extractKey(resp.body());
  }

  /** Pull the value of the "key" field out of {"key": "..."}. */
  static String extractKey(String body) {
    int idx = body.indexOf("\"key\"");
    if (idx < 0) {
      throw new ParquetCryptoRuntimeException("malformed KMS response: " + body);
    }
    int start = body.indexOf('"', body.indexOf(':', idx) + 1) + 1;
    int end = body.indexOf('"', start);
    if (start <= 0 || end < start) {
      throw new ParquetCryptoRuntimeException("malformed KMS response: " + body);
    }
    return body.substring(start, end);
  }
}
