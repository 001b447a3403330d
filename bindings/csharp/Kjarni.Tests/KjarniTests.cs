// Tests mirror kjarni-ffi/bindings/csharp/Kjarni.Tests: require libkjarni.so
// (build with `make -C native`) on LD_LIBRARY_PATH and a populated model
// cache; model-dependent tests are gated on KJARNI_TEST_MODELS=1.
//
//   LD_LIBRARY_PATH=$REPO/native KJARNI_TEST_MODELS=1 \
//   dotnet test bindings/csharp/Kjarni.Tests

using System;
using Xunit;

namespace Kjarni.Tests
{
    public class CancelTokenTests
    {
        [Fact]
        public void CancelSticks()
        {
            using var tok = new CancelToken();
            Assert.False(tok.IsCancelled);
            tok.Cancel();
            Assert.True(tok.IsCancelled);
        }
    }

    public class ModelTests
    {
        private static bool HasModels =>
            Environment.GetEnvironmentVariable("KJARNI_TEST_MODELS") == "1";

        [Fact]
        public void ClassifierClassifies()
        {
            if (!HasModels) return;  // no model cache: pass vacuously
            using var clf = new Classifier();
            var r = clf.Classify("I love this product!");
            Assert.False(string.IsNullOrEmpty(r.Label));
            Assert.InRange(r.Score, 0.0, 1.0);
            Assert.Equal(2, clf.ClassifyBatch(new[] { "great", "awful" }).Count);
        }

        [Fact]
        public void EmbedderEmbedsAndRanks()
        {
            if (!HasModels) return;
            using var emb = new Embedder();
            Assert.NotEmpty(emb.Encode("hello world"));
            Assert.True(emb.Similarity("doctor", "physician") > 0.5);
            Assert.Equal(2, emb.EncodeBatch(new[] { "a", "b" }).Count);
        }

        [Fact]
        public void GeneratorStreamsWithCancel()
        {
            if (!HasModels) return;
            using var gen = new Generator();
            using var tok = new CancelToken();
            int n = 0;
            foreach (var piece in gen.GenerateStream("Once upon a time", tok))
            {
                if (++n >= 3) { tok.Cancel(); break; }
            }
            Assert.InRange(n, 1, 3);
        }
    }

}
