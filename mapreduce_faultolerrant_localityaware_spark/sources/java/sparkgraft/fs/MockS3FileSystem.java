package sparkgraft.fs;

import java.io.File;
import java.io.IOException;
import java.net.URI;
import java.net.URISyntaxException;
import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.fs.FSDataInputStream;
import org.apache.hadoop.fs.FSDataOutputStream;
import org.apache.hadoop.fs.FileStatus;
import org.apache.hadoop.fs.FileSystem;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;
import org.apache.hadoop.fs.permission.FsPermission;
import org.apache.hadoop.util.Progressable;

/**
 * Offline stand-in for an S3-style object store, used by the engine's
 * storage-plane contract tests (tests/test_objectstore_path.py).
 *
 * The reference runs its chunk/state plane on real S3
 * (aws_SDK_wrap/s3Wrap.go:72-111); this sandbox has no cloud and no
 * hadoop-aws jars, so this class reproduces the CONTRACT an s3a://
 * user exercises first, on top of a local directory:
 *
 *   - scheme registration via fs.mocks3.impl and FileSystem-registry
 *     dispatch (the exact mechanism that resolves s3a://),
 *   - bucket-as-authority URIs: mocks3://bucket/key,
 *   - credentials-style configuration REQUIRED at initialize():
 *     fs.mocks3.access.key / fs.mocks3.secret.key -- missing creds
 *     fail fast with the same shape of error S3A raises,
 *   - all paths returned to callers stay in the mocks3:// scheme
 *     (status/listing rewrite), so committers, _SUCCESS markers and
 *     partition discovery run against the non-local scheme end-to-end.
 *
 * Data lands under fs.mocks3.root/&lt;bucket&gt;/&lt;key&gt;.
 */
public class MockS3FileSystem extends FileSystem {
  private final RawLocalFileSystem local = new RawLocalFileSystem();
  private URI uri;
  private String root;
  private String bucket;
  private Path workingDir;

  @Override
  public void initialize(URI name, Configuration conf) throws IOException {
    super.initialize(name, conf);
    String access = conf.get("fs.mocks3.access.key");
    String secret = conf.get("fs.mocks3.secret.key");
    if (access == null || access.isEmpty() || secret == null || secret.isEmpty()) {
      throw new IOException(
          "No mocks3 credentials provided: set fs.mocks3.access.key and "
              + "fs.mocks3.secret.key (credentials contract, mirroring "
              + "fs.s3a.access.key/fs.s3a.secret.key)");
    }
    root = conf.get("fs.mocks3.root");
    if (root == null || root.isEmpty()) {
      throw new IOException("fs.mocks3.root not set (local backing directory)");
    }
    bucket = name.getAuthority();
    if (bucket == null || bucket.isEmpty()) {
      throw new IOException("mocks3 URI has no bucket authority: " + name);
    }
    this.uri = URI.create("mocks3://" + bucket);
    this.workingDir = new Path("/");
    local.initialize(URI.create("file:///"), conf);
  }

  @Override
  public String getScheme() {
    return "mocks3";
  }

  @Override
  public URI getUri() {
    return uri;
  }

  /** mocks3://bucket/key -> file:<root>/<bucket>/key */
  private Path toLocal(Path p) {
    Path abs = p.isAbsolute() ? p : new Path(workingDir, p);
    String key = abs.toUri().getPath();
    return new Path("file:" + root + "/" + bucket + key);
  }

  /** file:<root>/<bucket>/key -> mocks3://bucket/key */
  private Path fromLocal(Path p) {
    String lp = p.toUri().getPath();
    String prefix = root + "/" + bucket;
    String key = lp.startsWith(prefix) ? lp.substring(prefix.length()) : lp;
    if (key.isEmpty()) {
      key = "/";
    }
    try {
      return new Path(new URI("mocks3", bucket, key, null, null));
    } catch (URISyntaxException e) {
      throw new IllegalArgumentException(e);
    }
  }

  private FileStatus rewrite(FileStatus s) {
    s.setPath(fromLocal(s.getPath()));
    return s;
  }

  @Override
  public FSDataInputStream open(Path f, int bufferSize) throws IOException {
    return local.open(toLocal(f), bufferSize);
  }

  @Override
  public FSDataOutputStream create(
      Path f,
      FsPermission permission,
      boolean overwrite,
      int bufferSize,
      short replication,
      long blockSize,
      Progressable progress)
      throws IOException {
    return local.create(
        toLocal(f), permission, overwrite, bufferSize, replication, blockSize, progress);
  }

  @Override
  public FSDataOutputStream append(Path f, int bufferSize, Progressable progress)
      throws IOException {
    return local.append(toLocal(f), bufferSize, progress);
  }

  @Override
  public boolean rename(Path src, Path dst) throws IOException {
    return local.rename(toLocal(src), toLocal(dst));
  }

  @Override
  public boolean delete(Path f, boolean recursive) throws IOException {
    return local.delete(toLocal(f), recursive);
  }

  @Override
  public FileStatus[] listStatus(Path f) throws IOException {
    FileStatus[] raw = local.listStatus(toLocal(f));
    FileStatus[] out = new FileStatus[raw.length];
    for (int i = 0; i < raw.length; i++) {
      out[i] = rewrite(raw[i]);
    }
    return out;
  }

  @Override
  public void setWorkingDirectory(Path newDir) {
    workingDir = newDir.isAbsolute() ? newDir : new Path(workingDir, newDir);
  }

  @Override
  public Path getWorkingDirectory() {
    return workingDir;
  }

  @Override
  public boolean mkdirs(Path f, FsPermission permission) throws IOException {
    return local.mkdirs(toLocal(f), permission);
  }

  @Override
  public FileStatus getFileStatus(Path f) throws IOException {
    return rewrite(local.getFileStatus(toLocal(f)));
  }
}
